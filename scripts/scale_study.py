"""Three-point scale study (VERDICT r12 Next #3): measure, don't argue.

The five families whose 100 TB story was previously argued from plan
shape — MinHash pair discovery, the incremental index probe, winnowing
substring dedup, ANN probes, session windows, and TopN materialization
— are timed at sf0.01 / sf0.1 / sf1 over a SEED-FIXED generated corpus
with the same shape as the driver's testdata (TESTDATA.md; the
read-only /root/testdata is never touched), and each adjacent pair of
scale points is fitted to an exponent:

    t ~ sf^e   =>   e = ln(t_hi/t_lo) / ln(sf_hi/sf_lo)

Corpus shape (profiled from /root/testdata/sf0.1, matched so the
generated sf0.1 walls validate against the real sf0.1 walls):
  documents  — 50k rows/sf (min 500): 10..100 tokens uniform over the
               SAME 30-word vocabulary (ambient similarity is the pair
               volume's driver, so the vocabulary must match), 5% of
               docs are a random earlier doc's text + " dup";
               lang en 40% / {de,es,fr,zh} 15%; source = id % 20.
  embeddings — 20k rows/sf (min 500): unit-norm 64-dim gaussian,
               label uniform 0..9.
  events     — 1M rows/sf: ts uniform over 2024-01 (the registry time
               ranges), users 15k/sf (constant per-user density, so
               sessionization's per-key work is scale-free), 5 types,
               exponential(50) value, {"k": n} props.

Timing methodology: per entry, one warm pass (cold — includes one-time
index/posting builds, which disk-cache), then up to two timed passes
keeping the minimum (one pass at sf1 for the quadratic-answer entries,
recorded as passes=1). Execution sink is the noop writer — full plan
execution without driver-side row serialization (the k32 lesson:
collect() measures pickling, not the engine) — except the ~48-row
checksum aggregates, which are collected to ALSO record the answer's
pair volume (the quantity the dedup exponents are expected to track).

Run:  python scripts/scale_study.py [--scales 0.01,0.1,1]
Writes SCALE_STUDY.json at the repo root.
"""
from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "the",
    "row", "agg", "key", "query", "a", "scan", "batch",
]
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.4, 0.15, 0.15, 0.15, 0.15]
SEED = 42

# the five families (VERDICT r12 Next #3), as registry entries so the
# study times exactly the code the driver and bench run
ENTRIES = [
    ("dedup_minhash_lsh_agg", "collect"),      # pair family (K=8 default)
    ("dedup_minhash_incremental", "collect"),  # write-time index probe
    ("dedup_substring_winnow", "noop"),        # winnowing pair family
    ("ann_ivfpq_topk", "noop"),                # ANN probe (compressed)
    ("ann_ivf_incremental_topk", "noop"),      # ANN probe (incremental)
    ("events_session_window", "noop"),         # session event-time window
    ("topn_per_window", "noop"),               # TopN materialization
]
# entries whose sf1 pass count is 1 (quadratic answer volume)
SINGLE_PASS_AT_SF1 = {"dedup_minhash_lsh_agg", "dedup_substring_winnow"}


def gen_corpus(out_dir: str, sf: float, seed: int = SEED) -> None:
    """Deterministic corpus of the TESTDATA.md shape at scale ``sf``.
    Idempotent per directory (skips if the _DONE marker exists)."""
    import numpy as np
    import pandas as pd

    done = os.path.join(out_dir, "_DONE")
    if os.path.exists(done):
        return
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)

    n_docs = max(500, int(50_000 * sf))
    lens = rng.integers(10, 101, size=n_docs)
    word_ix = rng.integers(0, len(VOCAB), size=int(lens.sum()))
    texts, pos = [], 0
    for i in range(n_docs):
        ln = int(lens[i])
        if i > 0 and rng.random() < 0.05:
            texts.append(texts[int(rng.integers(0, i))] + " dup")
            pos += ln  # keep the stream aligned regardless of the branch
        else:
            texts.append(" ".join(VOCAB[w] for w in word_ix[pos:pos + ln]))
            pos += ln
    pd.DataFrame({
        "doc_id": np.arange(n_docs, dtype="int64"),
        "text": texts,
        "lang": rng.choice(LANGS, size=n_docs, p=LANG_P),
        "source": [f"src{i % 20}" for i in range(n_docs)],
        "n_chars": [len(t) for t in texts],
    }).to_parquet(os.path.join(out_dir, "documents.parquet"), index=False)

    n_emb = max(500, int(20_000 * sf))
    vecs = rng.standard_normal((n_emb, 64))
    vecs = (vecs / np.linalg.norm(vecs, axis=1, keepdims=True)).astype(
        "float32")
    pd.DataFrame({
        "vec_id": np.arange(n_emb, dtype="int64"),
        "embedding": list(vecs),
        "label": rng.integers(0, 10, size=n_emb).astype("int32"),
    }).to_parquet(os.path.join(out_dir, "embeddings.parquet"), index=False)

    n_ev = int(1_000_000 * sf)
    n_users = max(15, int(15_000 * sf))
    t0 = np.datetime64("2024-01-01T00:00:00")
    span = np.timedelta64(30, "D") / np.timedelta64(1, "s")
    ts = t0 + (rng.random(n_ev) * span * 1e6).astype("timedelta64[us]")
    ts.sort()
    pd.DataFrame({
        "event_id": np.arange(n_ev, dtype="int64"),
        "ts": ts,
        "user_id": rng.integers(0, n_users, size=n_ev).astype("int64"),
        "event_type": rng.choice(
            ["view", "click", "purchase", "signup", "error"], size=n_ev),
        "value": np.round(rng.exponential(50.0, size=n_ev), 2),
        "props": [f'{{"k": {int(k)}}}'
                  for k in rng.integers(0, 100, size=n_ev)],
    }).to_parquet(os.path.join(out_dir, "events.parquet"), index=False)
    with open(done, "w") as f:
        f.write("ok")


def _run(df, sink: str):
    if sink == "collect":
        return df.collect()
    df.write.format("noop").mode("overwrite").save()
    return None


def time_entries(spark, qs, sf_dir: str, sf: float) -> dict:
    from skywalking_banyandb_spark.functions import dedup as dd

    out: dict = {}
    for name, sink in ENTRIES:
        passes = 1 if (sf >= 1 and name in SINGLE_PASS_AT_SF1) else 2
        t0 = time.perf_counter()
        rows = _run(qs[name](spark, sf_dir), sink)
        cold = time.perf_counter() - t0
        best = None
        for _ in range(passes):
            t0 = time.perf_counter()
            rows = _run(qs[name](spark, sf_dir), sink)
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        rec = {"cold_sec": round(cold, 3), "steady_sec": round(best, 3),
               "passes": passes}
        if sink == "collect" and rows is not None:
            rec["answer_pairs"] = int(sum(r.n_pairs for r in rows))
        out[name] = rec
        print(f"    {name}: cold {rec['cold_sec']}s steady "
              f"{rec['steady_sec']}s {rec.get('answer_pairs', '')}",
              flush=True)
    dd.release_minhash_cache()
    return out


def fit(results: dict, scales) -> dict:
    exps: dict = {}
    for name, _ in ENTRIES:
        per = []
        for lo, hi in zip(scales, scales[1:]):
            a = results[str(lo)][name]["steady_sec"]
            b = results[str(hi)][name]["steady_sec"]
            per.append({
                "from_sf": lo, "to_sf": hi,
                "exponent": round(math.log(b / a) / math.log(hi / lo), 3),
            })
        exps[name] = per
    return exps


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="0.01,0.1,1")
    ap.add_argument("--validate", action="store_true",
                    help="also time the real /root/testdata/sf0.1 for a "
                         "generated-vs-real shape check")
    args = ap.parse_args()
    scales = [float(s) for s in args.scales.split(",")]

    import tempfile

    from skywalking_banyandb_spark.session import get_spark

    root = os.path.join(tempfile.gettempdir(), "banyandb_scale_study")
    os.environ["SPARK_GRAFT_INDEX_DIR"] = os.path.join(root, "indexes")
    spark = get_spark("banyandb-scale-study")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as em
    qs = em.queries()

    results: dict = {}
    for sf in scales:
        d = os.path.join(root, f"gen_sf{sf}")
        print(f"[gen] sf{sf} -> {d}", flush=True)
        t0 = time.perf_counter()
        gen_corpus(d, sf)
        print(f"[gen] done in {time.perf_counter() - t0:.1f}s", flush=True)
        print(f"[time] sf{sf}", flush=True)
        results[str(sf)] = time_entries(spark, qs, d, sf)

    record = {"seed": SEED, "scales": scales, "results": results,
              "exponents": fit(results, scales)}
    if args.validate:
        print("[time] real sf0.1 (validation)", flush=True)
        record["real_sf0.1"] = time_entries(
            spark, qs, "/root/testdata/sf0.1", 0.1)

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SCALE_STUDY.json")
    with open(out, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps(record["exponents"], indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
