"""Go ``encoding/json``-compatible marshalling + record identity kernels.

Byte-parity-critical pieces of the reference:

* ``applyHashKey`` (main.go:1009-1036): MD5 over a Go ``json.Marshal`` of a
  list of strings, with the HTML escapes ``\\u003c``/``\\u003e``/``\\u0026``
  replaced back to ``<``/``>``/``&``.  Net effect: Go string escaping with
  EscapeHTML off.
* ``encodeFielsToB64`` (main.go:1064-1077): base64 of text/author/reply fields
  (only when non-empty).
* ``WriteDataToFileAsJSON`` (utils/utils.go:25-40): JSONL with
  ``SetEscapeHTML(false)`` and struct-order keys with ``omitempty``
  (main.go:110-124 ``ReviewFomate``; main.go:103-107 ``OwnerReply``).

Go's string escaper differs from ``json.dumps``: it short-escapes only
``\\n \\r \\t \" \\\\``; every other control char (including ``\\b``/``\\f``,
which Python short-escapes) becomes ``\\u00xx``; U+2028/U+2029 are always
escaped; non-ASCII is emitted raw (we always write UTF-8).
"""

from __future__ import annotations

import base64
import hashlib
import re

_SHORT = {"\n": "\\n", "\r": "\\r", "\t": "\\t", '"': '\\"', "\\": "\\\\"}
# every char Go's escaper touches (EscapeHTML off): the five short escapes,
# other C0 controls (\u00xx), and U+2028/U+2029
_ESC_RE = re.compile(r'[\x00-\x1f"\\\u2028\u2029]')


def _esc_one(m: re.Match) -> str:
    ch = m.group(0)
    esc = _SHORT.get(ch)
    return esc if esc is not None else f"\\u{ord(ch):04x}"


def go_json_string(s: str) -> str:
    """Marshal one string exactly like Go json.Marshal with EscapeHTML(false).

    Regex fast path: strings with nothing to escape (the common case \u2014 b64
    fields are pure [A-Za-z0-9+/=]) return in one C-level scan; the per-char
    Python loop this replaces was 54 % of the record-render profile."""
    if _ESC_RE.search(s) is None:
        return f'"{s}"'
    return '"' + _ESC_RE.sub(_esc_one, s) + '"'


def go_marshal_string_list(lst: list[str]) -> bytes:
    """``json.Marshal([]string)`` with the reference's post-replacement of
    HTML escapes (main.go:1027-1031) — i.e. EscapeHTML(false) semantics."""
    return ("[" + ",".join(go_json_string(s) for s in lst) + "]").encode("utf-8")


def review_hash(text: str, author_name: str, review_id: str,
                reply_texts: list[str]) -> str:
    """Record identity (main.go:1009-1036).

    Branches (main.go:1014-1026):
      1. no text, no author, no non-empty-first-reply, but id → [review_id]
      2. first reply has text → [text, author, reply0]
      3. else → [text, author]
    """
    has_responses = bool(reply_texts) and reply_texts[0] != ""
    if text == "" and author_name == "" and not has_responses and review_id != "":
        lst = [review_id]
    elif has_responses:
        lst = [text, author_name, reply_texts[0]]
    else:
        lst = [text, author_name]
    return hashlib.md5(go_marshal_string_list(lst)).hexdigest()


def b64(s: str) -> str:
    return base64.b64encode(s.encode("utf-8")).decode("ascii")


def encode_record_b64(rec: dict) -> dict:
    """``encodeFielsToB64`` parity (main.go:1064-1077): b64 text/author when
    non-empty; replies encoded (both fields, even empty ones) only when the
    first reply has non-empty text."""
    rec = dict(rec)
    if rec.get("text"):
        rec["text"] = b64(rec["text"])
    if rec.get("author_name"):
        rec["author_name"] = b64(rec["author_name"])
    replies = rec.get("responses") or []
    if replies and replies[0].get("text"):
        rec["responses"] = [
            {**r, "text": b64(r.get("text", "")), "author_name": b64(r.get("author_name", ""))}
            for r in replies
        ]
    return rec


# JSONL record serialization: ReviewFomate struct order (main.go:110-124), all
# fields omitempty except review_hash.  Field NAMES are constants — their
# escaped ``"name":`` prefixes are rendered once at import (the per-record
# go_json_string(name) calls were ~60% of the escaper's call count).
_FIELDS = [
    (name, kind, go_json_string(name) + ":") for name, kind in [
        ("parent_id", "str"), ("author_name", "str"), ("text", "str"),
        ("source_date", "str"), ("review_id", "str"), ("author_id", "str"),
        ("photos", "list_str"), ("not_recommended", "bool"), ("rating", "int"),
        ("scraped_at", "int"), ("posted_at", "int"), ("responses", "replies"),
    ]
]
# OwnerReply main.go:103-107
_REPLY_FIELDS = [(f, go_json_string(f) + ":")
                 for f in ("author_name", "text", "posted_at")]


_PFX = {name: pfx for name, _kind, pfx in _FIELDS}
_RPFX = dict(_REPLY_FIELDS)

# hoisted prefix constants for the per-review hot path (render_review runs
# once per record; LOAD_GLOBAL beats two dict getitems per field at ~220k
# calls per 4k-business crawl)
_P_PARENT = _PFX["parent_id"]
_P_AUTHOR = _PFX["author_name"]
_P_TEXT = _PFX["text"]
_P_SRCDATE = _PFX["source_date"]
_P_RID = _PFX["review_id"]
_P_AID = _PFX["author_id"]
_P_PHOTOS = _PFX["photos"]
_P_RATING = _PFX["rating"]
_P_SCRAPED = _PFX["scraped_at"]
_P_POSTED = _PFX["posted_at"]
_P_RESP = _PFX["responses"]
_RP_AUTHOR = _RPFX["author_name"]
_RP_TEXT = _RPFX["text"]
_RP_POSTED = _RPFX["posted_at"]


def render_record(rec: dict, scraped_at: int) -> tuple[str, str]:
    """Fused identity + b64 + JSONL render: byte-identical to
    ``record_to_jsonl(encode_record_b64(finalize_record_identity(rec)))``
    with ``rec["scraped_at"] = scraped_at`` — but one pass, no intermediate
    dict copies, and no escaper calls on fields that are base64 by
    construction.  The unfused chain was ~60% of the extract-wave profile
    (equivalence is unit-tested against the unfused functions).
    Returns (review_hash, jsonl_line)."""
    text = rec.get("text", "")
    author = rec.get("author_name", "")
    rid = rec.get("review_id", "")
    replies = rec.get("responses") or []
    reply0_text = replies[0].get("text", "") if replies else ""
    has_resp = reply0_text != ""
    # identity over RAW fields (applyHashKey, main.go:1009-1036)
    if text == "" and author == "" and not has_resp and rid != "":
        lst = [rid]
    elif has_resp:
        lst = [text, author, reply0_text]
    else:
        lst = [text, author]
    rh = hashlib.md5(go_marshal_string_list(lst)).hexdigest()

    parts = []
    ap = parts.append
    v = rec.get("parent_id")
    if v:
        ap(_PFX["parent_id"] + go_json_string(v))
    if author:
        ap(_PFX["author_name"] + '"' + b64(author) + '"')
    if text:
        ap(_PFX["text"] + '"' + b64(text) + '"')
    v = rec.get("source_date")
    if v:
        ap(_PFX["source_date"] + go_json_string(v))
    if rid:
        ap(_PFX["review_id"] + go_json_string(rid))
    v = rec.get("author_id")
    if v:
        ap(_PFX["author_id"] + go_json_string(v))
    v = rec.get("photos")
    if v:
        ap(_PFX["photos"] + "["
           + ",".join(go_json_string(x) for x in v) + "]")
    if rec.get("not_recommended"):
        ap(_PFX["not_recommended"] + "true")
    v = rec.get("rating")
    if v:
        ap(_PFX["rating"] + str(int(v)))
    if scraped_at:
        ap(_PFX["scraped_at"] + str(int(scraped_at)))
    v = rec.get("posted_at")
    if v:
        ap(_PFX["posted_at"] + str(int(v)))
    if replies:
        objs = []
        for r in replies:
            fields = []
            ra = r.get("author_name", "")
            rt = r.get("text", "")
            if has_resp:  # encodeFielsToB64 branch: replies b64-encoded
                if ra:
                    fields.append(_RPFX["author_name"] + '"' + b64(ra) + '"')
                if rt:
                    fields.append(_RPFX["text"] + '"' + b64(rt) + '"')
            else:
                if ra:
                    fields.append(_RPFX["author_name"] + go_json_string(ra))
                if rt:
                    fields.append(_RPFX["text"] + go_json_string(rt))
            rp = r.get("posted_at", "")
            if rp:
                fields.append(_RPFX["posted_at"] + go_json_string(rp))
            objs.append("{" + ",".join(fields) + "}")
        ap(_PFX["responses"] + "[" + ",".join(objs) + "]")
    ap('"review_hash":' + go_json_string(rh))
    return rh, "{" + ",".join(parts) + "}"


def render_review(parent_id: str, rid: str, aid: str, author: str, text: str,
                  source_date: str, photos: list, rating: int,
                  scraped_at: int, posted_at: int,
                  replies: list) -> tuple[str, str]:
    """``render_record`` from scalars — no record dict at all.

    Same bytes as ``render_record`` over the equivalent dict (parity-tested
    in tests/test_feed_fusion.py); ``replies`` is a list of
    ``(author_name, text, posted_at_str)`` tuples.  Feed pages carry
    ``not_recommended=False`` always, so omitempty drops it and the field
    needs no parameter.  Used by ``extract.render_review_feed``."""
    reply0_text = replies[0][1] if replies else ""
    has_resp = reply0_text != ""
    # identity over RAW fields (applyHashKey, main.go:1009-1036)
    if text == "" and author == "" and not has_resp and rid != "":
        lst = [rid]
    elif has_resp:
        lst = [text, author, reply0_text]
    else:
        lst = [text, author]
    rh = hashlib.md5(go_marshal_string_list(lst)).hexdigest()

    parts = []
    ap = parts.append
    if parent_id:
        ap(_P_PARENT + go_json_string(parent_id))
    if author:
        ap(_P_AUTHOR + '"' + b64(author) + '"')
    if text:
        ap(_P_TEXT + '"' + b64(text) + '"')
    if source_date:
        ap(_P_SRCDATE + go_json_string(source_date))
    if rid:
        ap(_P_RID + go_json_string(rid))
    if aid:
        ap(_P_AID + go_json_string(aid))
    if photos:
        ap(_P_PHOTOS + "[" + ",".join(map(go_json_string, photos)) + "]")
    if rating:
        ap(_P_RATING + str(rating))
    if scraped_at:
        ap(_P_SCRAPED + str(scraped_at))
    if posted_at:
        ap(_P_POSTED + str(posted_at))
    if replies:
        objs = []
        for ra, rt, rp in replies:
            fields = []
            if has_resp:  # encodeFielsToB64 branch: replies b64-encoded
                if ra:
                    fields.append(_RP_AUTHOR + '"' + b64(ra) + '"')
                if rt:
                    fields.append(_RP_TEXT + '"' + b64(rt) + '"')
            else:
                if ra:
                    fields.append(_RP_AUTHOR + go_json_string(ra))
                if rt:
                    fields.append(_RP_TEXT + go_json_string(rt))
            if rp:
                fields.append(_RP_POSTED + go_json_string(rp))
            objs.append("{" + ",".join(fields) + "}")
        ap(_P_RESP + "[" + ",".join(objs) + "]")
    ap('"review_hash":' + go_json_string(rh))
    return rh, "{" + ",".join(parts) + "}"


def record_to_jsonl(rec: dict) -> str:
    """One ReviewFomate as a Go-encoder JSONL line (without trailing newline).

    ``omitempty`` drops Go zero values: "" / 0 / false / nil slice.  Inside an
    OwnerReply, each field is itself omitempty (main.go:104-106).
    """
    parts = []
    for name, kind, pfx in _FIELDS:
        v = rec.get(name)
        if kind == "str":
            if v:
                parts.append(pfx + go_json_string(v))
        elif kind == "list_str":
            if v:
                parts.append(pfx + "[" + ",".join(go_json_string(x) for x in v) + "]")
        elif kind == "bool":
            if v:
                parts.append(pfx + "true")
        elif kind == "int":
            if v:
                parts.append(pfx + str(int(v)))
        elif kind == "replies":
            if v:
                objs = []
                for r in v:
                    fields = [
                        rpfx + go_json_string(r[f])
                        for f, rpfx in _REPLY_FIELDS if r.get(f)
                    ]
                    objs.append("{" + ",".join(fields) + "}")
                parts.append(pfx + "[" + ",".join(objs) + "]")
    parts.append(f"\"review_hash\":{go_json_string(rec.get('review_hash', ''))}")
    return "{" + ",".join(parts) + "}"
