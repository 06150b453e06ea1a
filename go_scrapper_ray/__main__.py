"""CLI entry — the reference's cobra surface (S1/S2), Ray-Data-native.

Reference parity (``main.go:179-220``):

* ``-a NAME=VALUE`` — VALUE is **base64(JSON)** of one Spider config
  (``main.go:31-52``); decoded exactly like ``setPlace``: split on the
  FIRST ``=``, base64-decode, JSON-parse — and, like the reference
  (which panics), malformed input exits non-zero.
* ``-o FILE`` — JSONL output path, opened append-mode
  (``O_APPEND|O_CREATE``, ``main.go:936-948``); the run's meta object
  lands beside it as ``<base>-meta.json`` (filename derivation
  ``main.go:973-975``: everything before the LAST dot).
* ``-s NAME=VALUE`` — setvar (``main.go:188,197``); recognized names:
  ``WORKDIR`` (scratch dir). Others are accepted and ignored, as the
  reference ignores unknown setvars.

Rebuild-only flag: ``--corpus DIR`` — the Parquet page table standing in
for the live web (fetch-as-lookup, SURVEY.md J3).  Without ``-a`` every
seed in ``DIR/seeds.parquet`` crawls (the engine's batch mode).

Usage::

    python -m go_scrapper_ray --corpus /tmp/corpus \
        -a 'SPIDER=eyJwcm9maWxlX2tleSI6ICJodHRwczovLy4uLiJ9' \
        -o out/reviews.jsonl
"""

from __future__ import annotations

import argparse
import base64
import json
import sys
import tempfile
from pathlib import Path


def decode_spider_arg(arg: str) -> dict:
    """``setPlace`` parity (main.go:204-220): NAME=VALUE, base64, JSON.

    Returns the raw Spider-shaped dict; raises ValueError on malformed
    input (the reference panics)."""
    if "=" not in arg:
        raise ValueError(f"malformed -a argument (want NAME=VALUE): {arg!r}")
    _, _, blob = arg.partition("=")
    try:
        raw = base64.b64decode(blob, validate=True)
        return json.loads(raw)
    except Exception as e:  # noqa: BLE001 — single parity exit path
        raise ValueError(f"malformed -a payload: {e}") from e


def spider_to_seed_row(d: dict, seed_id: int = 0) -> dict:
    """Map the reference Spider JSON fields (main.go:31-52) onto the
    engine's seeds-table row.  Unknown fields are ignored (the reference's
    json.Unmarshal drops them too); address is the nested object."""
    addr = d.get("address") or {}
    return {
        "seed_id": seed_id,
        "url": d.get("profile_key", "") or "",
        "business_name": d.get("business_name", "") or "",
        "addr_street": addr.get("street", "") or "",
        "addr_city": addr.get("city", "") or "",
        "addr_state": addr.get("state", "") or "",
        "addr_zip": addr.get("zip", "") or "",
        "first_page_only": int(d.get("first_page_only", 0) or 0),
        "last_review_hashes": list(d.get("last_review_hashes") or []),
    }


def _seed_table(rows: list[dict]):
    import pyarrow as pa
    return pa.table({
        "seed_id": pa.array([r["seed_id"] for r in rows], pa.int64()),
        "url": pa.array([r["url"] for r in rows], pa.string()),
        "business_name": pa.array([r["business_name"] for r in rows],
                                  pa.string()),
        "addr_street": pa.array([r["addr_street"] for r in rows], pa.string()),
        "addr_city": pa.array([r["addr_city"] for r in rows], pa.string()),
        "addr_state": pa.array([r["addr_state"] for r in rows], pa.string()),
        "addr_zip": pa.array([r["addr_zip"] for r in rows], pa.string()),
        "first_page_only": pa.array([r["first_page_only"] for r in rows],
                                    pa.int32()),
        "last_review_hashes": pa.array([r["last_review_hashes"] for r in rows],
                                       pa.list_(pa.string())),
    })


def meta_path_for(output: str) -> str:
    """``dumpMetaData`` filename derivation (main.go:973-975): strip after
    the last dot, append ``-meta.json``."""
    base, dot, _ = output.rpartition(".")
    return (base if dot else output) + "-meta.json"


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="go_scrapper_ray")
    p.add_argument("-a", "--args", default=None,
                   help="NAME=base64(JSON Spider config)")
    p.add_argument("-o", "--output", default=None,
                   help="JSONL output file (append-mode)")
    p.add_argument("-s", "--setvar", action="append", default=[],
                   help="NAME=VALUE setvar (WORKDIR recognized)")
    p.add_argument("--corpus", required=True,
                   help="parquet web-corpus dir (pages/seeds/robots)")
    args = p.parse_args(argv)

    setvars = dict(v.partition("=")[::2] for v in args.setvar)

    seeds_tbl = None
    if args.args is not None:
        try:
            spider = decode_spider_arg(args.args)
        except ValueError as e:
            print(f"go_scrapper_ray: {e}", file=sys.stderr)
            return 1
        seeds_tbl = _seed_table([spider_to_seed_row(spider)])
        # persona (main.go:40-44) decodes at the CLI surface; the
        # lookup-based fetch has no transport, so it applies only when a
        # live-HTTP page source builds FetchSession(persona=...) — say so
        # rather than silently accepting a proxy that does nothing here
        from go_scrapper_ray.config import Persona
        persona = Persona.from_spider(spider)
        if persona is not None and persona.proxy:
            print("go_scrapper_ray: persona/proxy parsed; the lookup-"
                  "based fetch ignores transport (applies only with a "
                  "live-HTTP page source)", file=sys.stderr)

    import os

    import ray
    owns_ray = not ray.is_initialized()
    if owns_ray:
        # standalone: a local instance; under `ray job submit` the job
        # runtime sets RAY_ADDRESS and this attaches the cluster instead
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False)
    try:
        from go_scrapper_ray.pipelines.crawl import CrawlEngine

        # a STABLE workdir (-s WORKDIR=...) signals a resumable job:
        # per-round checkpoints land under it, and re-submitting the SAME
        # command after a kill AUTO-RESUMES from the latest complete
        # checkpoint (run() would rmtree it and restart from scratch —
        # the natural `ray job submit` retry must not destroy the very
        # state it was configured to keep).  `-s RESUME=0` forces a fresh
        # run.  The throwaway tempdir path skips checkpoint I/O (nothing
        # could ever resume from it).
        workdir = setvars.get("WORKDIR")
        eng = CrawlEngine(args.corpus,
                          workdir or tempfile.mkdtemp(prefix="gsr_cli_"),
                          checkpoints=workdir is not None,
                          seeds_override=seeds_tbl)
        ck = (eng.latest_checkpoint()
              if workdir is not None
              and setvars.get("RESUME", "auto") not in ("0", "never")
              else None)
        if ck is not None:
            try:
                eng.resume_from(ck)
            except ValueError as e:
                # different job under the same WORKDIR (corpus/seeds
                # changed) or an unreadable format: start fresh — run()'s
                # prologue clears the stale checkpoints
                print(f"go_scrapper_ray: not resuming ({e}); "
                      "starting a fresh run", file=sys.stderr)
                res = eng.run()
            else:
                print(f"go_scrapper_ray: resuming from checkpoint "
                      f"round={ck} under {workdir} (-s RESUME=0 forces "
                      "a fresh run)", file=sys.stderr)
                res = eng.resume_run()
        else:
            res = eng.run()
        workdir = str(eng.workdir)

        seed_ids = [s["seed_id"] for s in eng.seeds]
        if args.output:
            out = Path(args.output)
            out.parent.mkdir(parents=True, exist_ok=True)
            with open(out, "a", encoding="utf-8") as f:  # O_APPEND parity
                # one streaming ordered pass regardless of seed count
                for line in res.iter_jsonl(seed_ids):
                    f.write(line + "\n")
            meta = json.loads((Path(workdir) / "meta.json").read_text())
            chosen = (meta[str(seed_ids[0])] if len(seed_ids) == 1
                      else meta)
            Path(meta_path_for(str(out))).write_text(
                json.dumps(chosen, indent=1))
        else:
            for line in res.iter_jsonl(seed_ids):
                print(line)
        return 0
    finally:
        if owns_ray:
            ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
