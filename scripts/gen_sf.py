#!/usr/bin/env python3
"""Local scale-factor generator for scaling spot-checks (driver-side
tooling, like local_verify.py — not product code).

The driver generates /root/testdata/sf{0.001,0.01,0.1} (read-only, seed
42); its generator is not in the repo, so one-decade-up validation
(sf0.1 -> sf1) needs a local twin. This script mirrors the OBSERVED
schemas, domains, and distributions of the driver data:

  - lineitem: l_orderkey ~ U(orders)  => Poisson(~4) lines/order
    (sf0.1 observed 4.075 mean, 98.2% order coverage — matches),
    uniform partkey/suppkey, shipdate = orderdate + U(1,90) days
  - orders: uniform custkey, dates U(1995-01-01, 2001-08-01),
    totalprice U(1000, 500000)
  - documents: k ~ U(10,100) tokens drawn uniformly from the observed
    31-word vocabulary; lang {en:41%, zh/es/fr/de ~15%}; source
    src0..src19 (shingle DF density therefore grows linearly with the
    corpus — exactly the property the capped pair kernel is gated on)
  - events: 30 days of 2024-01, users = 10x sf0.1, 5 uniform types
  - embeddings: 64-dim N(0,1) float32, label U(0,9)
  - nation/region: copied verbatim from sf0.1 (fixed-size dims)

Row counts at sf=1: lineitem 6M, orders 1.5M, customer 150k, part
200k, supplier 10k, documents 50k, embeddings 20k, events 1M — 10x the
sf0.1 tables, same ratios.

Two EXTRA tables beyond the driver's schema feed round-13 artifacts
(drawn from an independent RNG stream, so every driver-mirrored table
is byte-identical to earlier generations at the same seed):

  - embeddings_planted: the embeddings table plus planted near-dup
    CLUSTERS — max(10, n_emb/500) parents each get 9 twins at cosine
    ~U(0.90, 0.99) to the parent (built as cos·u_parent + sin·w, w a
    unit vector orthogonal to the parent, same norm). Twins carry
    vec_id >= n_emb and parent_id = the parent's vec_id (originals
    carry parent_id = -1). Cluster members are mutually high-cosine
    (twin·twin ≈ c_i·c_j ∈ [0.81, 0.98] vs ≤ ~0.5 for the best noise
    pair), so a twin query's TRUE top-10 is exactly its cluster —
    recall@10 is meaningful, unlike near-uniform noise where no LSH
    can score (the r12 verdict's unmeasured-regime gap).
  - documents_code: a corpus with a HEAVY-TAILED character-level
    vocabulary (synthetic identifier-ish words built from a 200-
    syllable inventory under Zipf frequencies) so BPE has a deep
    learnable merge space — gen_sf documents draw from a ~31-word
    vocabulary that exhausts at 89 merges (r12 verdict #2); this
    table supports >= 1k real merges.

Usage: python3 scripts/gen_sf.py <sf> <outDir> [--zipf] [--extras-only]
   e.g. python3 scripts/gen_sf.py 1 target/sf1
        python3 scripts/gen_sf.py 0.1 target/sf0.1zipf --zipf
        python3 scripts/gen_sf.py 1 target/sf1 --extras-only
            (add embeddings_planted + documents_code to an existing dir
             without touching the driver-mirrored tables)

--zipf replaces the uniform key draws with Zipf(1.3) draws (key 0 is
the hottest; the hottest key absorbs a few percent of all rows) on the
join/agg keys the skew gate exercises — orders.o_custkey,
lineitem.{l_orderkey,l_partkey,l_suppkey}, events.user_id — and makes
document TEXTS repeat with Zipf multiplicity (hot boilerplate docs, the
shape the exact-contraction + capped pair kernels are designed for).
Schemas, row counts, value domains, and the seed are unchanged, so a
zipf dir is a drop-in SPARK_GRAFT_SF_DIR whose times are comparable to
the uniform dir at the same sf.
"""
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = np.array([
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window"])
LANGS = np.array(["en", "zh", "es", "fr", "de"])
LANG_P = np.array([0.41, 0.15, 0.15, 0.15, 0.14])
SEGMENTS = np.array(["AUTOMOBILE", "BUILDING", "FURNITURE",
                     "HOUSEHOLD", "MACHINERY"])
PRIORITIES = np.array(["1-URGENT", "2-HIGH", "3-MEDIUM",
                       "4-NOT SPECIFIED", "5-LOW"])
PTYPES = np.array(["ECONOMY", "LARGE", "MEDIUM", "PROMO",
                   "SMALL", "STANDARD"])
PNOUNS = np.array(["bolt", "ring", "screw", "plate", "tube",
                   "rod", "cap", "pin"])
PADJS = np.array(["large", "hot", "small", "red", "blue",
                  "green", "dim", "bright"])
EVENT_TYPES = np.array(["click", "view", "purchase", "signup", "error"])


def write(out, name, cols):
    pq.write_table(pa.table(cols), f"{out}/{name}.parquet")
    print(f"[gen] {name}: {len(next(iter(cols.values())))} rows")


def gen_extras(sf, out):
    """embeddings_planted + documents_code (independent RNG stream —
    regenerating these never perturbs the driver-mirrored tables)."""
    n_emb = max(500, int(20_000 * sf))
    n_doc = int(50_000 * sf)
    rng = np.random.default_rng(4242)

    # --- planted near-dup clusters over a fresh draw of the same
    # embedding distribution (the base embeddings.parquet stays the
    # byte-identical seed-42 table; this table is self-contained so the
    # parent/twin relation is reproducible from this stream alone)
    emb = rng.standard_normal((n_emb, 64)).astype(np.float32)
    label = rng.integers(0, 10, n_emb).astype(np.int32)
    n_clust = max(10, n_emb // 500)
    twins_per = 9
    n_plant = n_clust * twins_per
    parents = np.repeat(rng.choice(n_emb, n_clust, replace=False),
                        twins_per)
    pv = emb[parents].astype(np.float64)
    pn = np.linalg.norm(pv, axis=1, keepdims=True)
    u = pv / pn
    g = rng.standard_normal((n_plant, 64))
    g -= (g * u).sum(axis=1, keepdims=True) * u   # orthogonal component
    w = g / np.linalg.norm(g, axis=1, keepdims=True)
    cos = rng.uniform(0.90, 0.99, (n_plant, 1))
    twins = ((cos * u + np.sqrt(1 - cos ** 2) * w) * pn).astype(np.float32)
    write(out, "embeddings_planted", {
        "vec_id": np.concatenate([np.arange(n_emb, dtype=np.int64),
                                  n_emb + np.arange(n_plant, dtype=np.int64)]),
        "embedding": pa.array(list(emb) + list(twins),
                              type=pa.list_(pa.float32())),
        "label": np.concatenate([label, label[parents]]),
        "parent_id": np.concatenate([np.full(n_emb, -1, dtype=np.int64),
                                     parents.astype(np.int64)])})

    # --- identifier-ish corpus with a deep BPE merge space: words are
    # 2-4 syllables from a 200-syllable inventory, both syllable choice
    # and word frequency Zipf-distributed (natural-language shape), so
    # frequent character pairs exist at every merge depth
    cons = np.array(list("bcdfghjklmnpqrstvwxz"))
    vows = np.array(list("aeiou"))
    syll = np.array([c + v for c in cons for v in vows] +
                    [v + c for c in cons for v in vows])  # 200 total
    n_words = 30_000
    wl = rng.integers(2, 5, n_words)
    sflat = syll[(rng.zipf(1.5, int(wl.sum())) - 1) % len(syll)]
    woffs = np.concatenate(([0], np.cumsum(wl)))
    pool = np.array(["".join(sflat[woffs[i]:woffs[i + 1]])
                     for i in range(n_words)])
    lens = rng.integers(10, 61, n_doc)
    widx = (rng.zipf(1.3, int(lens.sum())) - 1) % n_words
    doffs = np.concatenate(([0], np.cumsum(lens)))
    texts = [" ".join(pool[widx[doffs[i]:doffs[i + 1]]])
             for i in range(n_doc)]
    write(out, "documents_code", {
        "doc_id": np.arange(n_doc, dtype=np.int64),
        "text": texts,
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64)})


def main(sf, out, zipf=False, extras_only=False):
    import os
    os.makedirs(out, exist_ok=True)
    if extras_only:
        gen_extras(sf, out)
        return
    rng = np.random.default_rng(42)

    def keys(n_rows, n_keys):
        """Key draw: uniform, or Zipf(1.3) folded into [0, n_keys)."""
        if not zipf:
            return rng.integers(0, n_keys, n_rows).astype(np.int64)
        return ((rng.zipf(1.3, n_rows) - 1) % n_keys).astype(np.int64)
    n_li = int(6_000_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_cust = int(150_000 * sf)
    n_part = int(200_000 * sf)
    n_supp = int(10_000 * sf)
    n_doc = int(50_000 * sf)
    # 500 floor: the checked-in /root/testdata dirs (older generator)
    # carry 500 embeddings even at sf0.001/sf0.01, and the q188 oracle
    # pins its plane count against a 500-vector input (vec_id < 500) —
    # an unfloored sf0.01 twin would only have 200 and silently change
    # the engine-derived cardinality (ADVICE r10).
    n_emb = max(500, int(20_000 * sf))
    n_ev = int(1_000_000 * sf)

    # dims copied verbatim (fixed-size at every sf)
    for t in ("nation", "region"):
        pq.write_table(
            pq.read_table(f"/root/testdata/sf0.1/{t}.parquet"),
            f"{out}/{t}.parquet")

    write(out, "customer", {
        "c_custkey": np.arange(n_cust, dtype=np.int64),
        "c_name": np.char.add("Customer#",
                              np.char.zfill(np.arange(n_cust).astype(str), 9)),
        "c_nationkey": rng.integers(0, 25, n_cust).astype(np.int32),
        "c_acctbal": np.round(rng.uniform(-999, 9999, n_cust), 2),
        "c_mktsegment": SEGMENTS[rng.integers(0, 5, n_cust)]})

    write(out, "supplier", {
        "s_suppkey": np.arange(n_supp, dtype=np.int64),
        "s_name": np.char.add("Supplier#",
                              np.char.zfill(np.arange(n_supp).astype(str), 9)),
        "s_nationkey": rng.integers(0, 25, n_supp).astype(np.int32),
        "s_acctbal": np.round(rng.uniform(-999, 9999, n_supp), 2)})

    write(out, "part", {
        "p_partkey": np.arange(n_part, dtype=np.int64),
        "p_name": np.char.add(np.char.add(
            PADJS[rng.integers(0, len(PADJS), n_part)], " "),
            PNOUNS[rng.integers(0, len(PNOUNS), n_part)]),
        "p_brand": np.char.add("Brand#",
                               rng.integers(1, 25, n_part).astype(str)),
        "p_type": PTYPES[rng.integers(0, len(PTYPES), n_part)],
        "p_size": rng.integers(1, 51, n_part).astype(np.int32),
        "p_retailprice": np.round(900.0 + np.arange(n_part) * 0.1 % 1000, 2)})

    day_us = 86_400_000_000
    d0 = np.datetime64("1995-01-01", "us")
    span_days = int((np.datetime64("2001-08-01") -
                     np.datetime64("1995-01-01")).astype(int))
    odate = d0 + (rng.integers(0, span_days + 1, n_ord) *
                  day_us).astype("timedelta64[us]")
    write(out, "orders", {
        "o_orderkey": np.arange(n_ord, dtype=np.int64),
        "o_custkey": keys(n_ord, n_cust),
        "o_orderstatus": np.array(["O", "F", "P"])[
            rng.integers(0, 3, n_ord)],
        "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
        "o_orderdate": odate,
        "o_orderpriority": PRIORITIES[rng.integers(0, 5, n_ord)]})

    lo = keys(n_li, n_ord)
    lo.sort()  # group lines of one order (drives linenumber sequence)
    # within-order running line number without a python loop; the
    # doubling ladder must cover the LARGEST group (zipf hot orders
    # run to thousands of lines, not the uniform ~20)
    run = np.zeros(n_li, dtype=np.int32)
    off = 1
    while off < n_li:
        shifted = np.zeros(n_li, dtype=np.int32)
        shifted[off:] = run[:-off] + off
        ok = np.zeros(n_li, dtype=bool)
        ok[off:] = lo[off:] == lo[:-off]
        grown = ok & (shifted > run)
        if not grown.any() and off > 16:
            break
        run = np.where(grown, shifted, run)
        off *= 2
    lnum = run + 1
    write(out, "lineitem", {
        "l_orderkey": lo,
        "l_partkey": keys(n_li, n_part),
        "l_suppkey": keys(n_li, n_supp),
        "l_linenumber": lnum,
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": np.array(["A", "N", "R"])[
            rng.integers(0, 3, n_li)],
        "l_linestatus": np.array(["O", "F"])[rng.integers(0, 2, n_li)],
        "l_shipdate": odate[lo] + (rng.integers(1, 91, n_li) *
                                   day_us).astype("timedelta64[us]")})

    lens = rng.integers(10, 101, n_doc)
    flat = VOCAB[rng.integers(0, len(VOCAB), int(lens.sum()))]
    offs = np.concatenate(([0], np.cumsum(lens)))
    texts = [" ".join(flat[offs[i]:offs[i + 1]]) for i in range(n_doc)]
    if zipf:
        # hot boilerplate: each doc's text is drawn from the unique
        # pool with Zipf multiplicity — text 0 repeats across a few
        # percent of the corpus (web-crawl re-crawl shape)
        texts = [texts[i] for i in keys(n_doc, n_doc)]
    write(out, "documents", {
        "doc_id": np.arange(n_doc, dtype=np.int64),
        "text": texts,
        "lang": LANGS[rng.choice(len(LANGS), n_doc, p=LANG_P)],
        "source": np.char.add("src", rng.integers(0, 20, n_doc).astype(str)),
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64)})

    emb = rng.standard_normal((n_emb, 64)).astype(np.float32)
    write(out, "embeddings", {
        "vec_id": np.arange(n_emb, dtype=np.int64),
        "embedding": pa.array(list(emb), type=pa.list_(pa.float32())),
        "label": rng.integers(0, 10, n_emb).astype(np.int32)})

    t0 = np.datetime64("2024-01-01", "us")
    write(out, "events", {
        "event_id": np.arange(n_ev, dtype=np.int64),
        "ts": t0 + rng.integers(0, 30 * day_us, n_ev)
            .astype("timedelta64[us]"),
        "user_id": keys(n_ev, int(15_000 * sf) or 1),
        "event_type": EVENT_TYPES[rng.integers(0, 5, n_ev)],
        "value": np.round(rng.uniform(0, 560, n_ev), 2),
        "props": np.char.add(np.char.add(
            '{"k": ', rng.integers(0, 100, n_ev).astype(str)), "}")})

    gen_extras(sf, out)


if __name__ == "__main__":
    main(float(sys.argv[1]), sys.argv[2], zipf="--zipf" in sys.argv[3:],
         extras_only="--extras-only" in sys.argv[3:])
