"""go_scrapper_ray — a Ray-Data-native distributed crawl / data-processing engine.

A from-scratch rebuild (NOT a port) of the capabilities of the reference
``Improwised/go-scrapper`` (a single-process colly/Go Yelp scraper, see
``/root/reference/main.go``) as a distributed URL frontier + fetch scheduler
over Parquet tables of Common-Crawl-style pages, expressed as
``ray.data.Dataset`` pipelines of ``map_batches`` over zero-copy Arrow
batches, with long-lived actor shards for the stateful pieces (URL-seen set,
per-host politeness queues, robots cache).

Layout:
  urlkit    — URL canonicalization + 64-bit hashing (reference main.go:273-291
              plus north-rule extensions)
  gojson    — Go-encoding/json-compatible marshalling, review_hash (MD5
              identity, main.go:1009-1036), base64 field encoding
  dates     — Go time.Parse("1/2/2006") tolerant date parsing
  minidom   — stdlib HTML parser + goquery-equivalent CSS selector subset +
              Text() semantics (byte-parity target)
  extract   — per-page-species extraction kernels shared by the distributed
              engine and the serial test oracle
  state/    — cuckoo filter, SeenShard / FrontierShard actors, robots parser
  sources/  — bucketed page store (fetch-as-lookup)
  stages/   — map_batches stages (fetch, extract, finalize)
  pipelines/— crawl driver loop; dedup / similarity / text-stats / events /
              multimodal pipelines over the testdata tables
"""

__version__ = "0.1.0"

from .mem import tune_malloc as _tune_malloc

_tune_malloc()  # see mem.py: keeps large batch temps on the warm heap
