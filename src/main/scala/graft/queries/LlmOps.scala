package graft.queries

/** SURVEY.md §2.D — the LLM-training-data-pipeline operator block
  * over `documents` (doc_id, text, lang, source, n_chars) and
  * `embeddings` (vec_id, embedding float[64], label), split along the
  * family seams: [[DedupQueries]] (d01–d20), [[AnnQueries]]
  * (s01–s20), [[TextQueries]] (x01–x37), [[MmQueries]]
  * (mm01–mm06), [[PipelineQueries]] (p01–p05), [[WebQueries]] (the
  * crawl front door — w01 WARC ingestion, x34 HTML extraction). This
  * object owns the registry — same names, same order as before the
  * split.
  *
  * Oracle notes: every float formula is written so DuckDB reproduces
  * it bit-for-bit — strict left folds for vector math (Spark
  * `aggregate` ≙ DuckDB `list_reduce`), integer-derived divisions,
  * ROUND(…, 6) on output. Hash-family-dependent ops oracle-gate
  * wherever the family is reproducible in plain SQL: d02/d03 via
  * md5-portable families, d05/s02 via the seeded SRP planes rendered
  * as literal weights. Only ops whose candidates depend on iterative
  * float training (k-means codebooks: d10, s03–s05) or on
  * approximate sketches (x11) stay rows-only, pinned by ScalaTests
  * (exactness of the verify step + recall vs the exact operators).
  */
object LlmOps {
  import DedupQueries._
  import AnnQueries._
  import TextQueries._
  import MmQueries._
  import PipelineQueries._

  val all: Seq[Q] = Seq(d01, d02, d02auto, d03, d03auto, d04, d04auto, d05, d05auto, d06, d07, d08, d09, d10, d10auto,
    d11, d12, d13, d14, d14fast, d15, d16, d17, d17auto, d18, d19, d20,
    s01, s02, s03, s04, s05, s05auto, s06, s07, s08, s09, s10, s11, s12, s13,
    s14, s15, s15auto, s16, s17, s18, s19, s19rot, s20, s21,
    x01, x02, x03, x04, x05, x06, x07, x08, x09, x10, x11, x12, x13, x14,
    x15, x16, x17, x18, x19, x20, x21, x22, x23, x24, x25, x26, x27, x28,
    x29, x30, x31, x32, x33, WebQueries.x34, x35, x36, x37, x38,
    p01, p02, p03, p03auto, p04, p05, WebQueries.p06, WebQueries.p07,
    WebQueries.p08, mm01, mm02, mm03, mm04, mm05, mm06,
    WebQueries.w01, WebQueries.w02, WebQueries.w03, WebQueries.w04,
    WebQueries.w05)
}
