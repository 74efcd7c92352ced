"""Distributed BPE tokenizer training (byte-pair encoding, Sennrich et al.
2016) — the tokenizer-learning step of an LLM data pipeline, expressed
Spark-first.

Classic BPE trains on the WORD-FREQUENCY table, not the raw corpus: the
only corpus-sized job is the initial word count (one shuffle); every merge
iteration then runs over the vocabulary — count adjacent symbol pairs
weighted by word frequency (explode + groupBy), pick the most frequent
pair (ties broken lexicographically for determinism), and apply the merge
to every word's symbol sequence with a pure-Catalyst greedy left-to-right
fold (``F.aggregate`` with an (out, pending) accumulator — no UDF). The
driver sees one (pair, count) row per iteration; vocab rows are
``localCheckpoint``-ed so plan lineage stays O(1) per merge instead of
O(merges).

At 100 TB: the word table is |vocab|-sized (millions of rows, not
corpus-sized), so the n_merges × (explode + groupBy) loop is cheap; the
final merge list (the trained tokenizer) is tiny driver-side state.
Exactness: ``tests/test_bpe.py`` proves the distributed trainer emits the
IDENTICAL merge sequence and final vocabulary as a from-scratch local
Python reference implementation on the same corpus.
"""

from __future__ import annotations

from typing import List, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

END = "</w>"


def _word_table(df: DataFrame, text_col: str) -> DataFrame:
    """corpus -> (word, freq, syms): whitespace words, split to character
    symbols plus the end-of-word marker."""
    words = (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .where(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    syms = F.concat(
        F.split(F.col("word"), ""),  # characters
        F.array(F.lit(END)),
    )
    return words.select("word", "freq", syms.alias("syms"))


def _pair_counts(vocab: DataFrame) -> DataFrame:
    pairs = F.transform(
        F.sequence(F.lit(1), F.size("syms") - 1),
        lambda i: F.concat_ws(
            " ", F.element_at(F.col("syms"), i),
            F.element_at(F.col("syms"), i + 1)),
    )
    return (
        vocab.where(F.size("syms") >= 2)
        .select("freq", F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.sum("freq").alias("n"))
    )


def _merge_expr(a: str, b: str) -> Column:
    """Greedy left-to-right merge of adjacent (a, b) into a+b — the
    textbook BPE replacement — as a Catalyst fold over the `syms` column."""
    return _merge_expr_on(F.col("syms"), a, b)


def learn_bpe(df: DataFrame, text_col: str,
              n_merges: int) -> List[Tuple[str, str, int]]:
    """Train ``n_merges`` BPE merges; returns [(a, b, count), ...] in
    merge order. Deterministic: the winning pair is (max count, then
    lexicographically smallest (a, b))."""
    vocab = _word_table(df, text_col).localCheckpoint()
    merges: List[Tuple[str, str, int]] = []
    for _ in range(n_merges):
        top = (
            _pair_counts(vocab)
            .orderBy(F.col("n").desc(), F.col("pair").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b = top[0]["pair"].split(" ")
        merges.append((a, b, int(top[0]["n"])))
        prev = vocab
        vocab = vocab.select(
            "word", "freq", _merge_expr(a, b).alias("syms")
        ).localCheckpoint()
        # free the superseded checkpoint's blocks now that the new one is
        # materialized (ADVICE r4: otherwise executor storage accumulates
        # one vocab snapshot per merge — linear leak at realistic 30k+
        # merge counts)
        _unpersist_checkpoint(prev)
    return merges


def _unpersist_checkpoint(df: DataFrame) -> None:
    """Release a localCheckpoint()'d DataFrame's storage blocks. The cached
    RDD lives inside the plan's LogicalRDD leaf (``DataFrame.rdd`` wraps a
    NEW derived RDD, so unpersisting that would be a no-op); the expected
    'lineage has been truncated' warning is fine — the checkpoint is never
    recomputed after being superseded."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass  # freeing storage is best-effort; never fail the training loop


def apply_bpe(df: DataFrame, text_col: str,
              merges: List[Tuple[str, str, int]],
              out_col: str = "bpe_tokens") -> DataFrame:
    """Tokenize a corpus with a trained merge list: per word, replay the
    merges in training order (same Catalyst fold); word-level results are
    flattened back per document. No UDF — chains n_merges folds."""
    words = F.filter(F.split(F.col(text_col), " "),
                     lambda w: F.length(w) > 0)
    doc = df.select(
        "*",
        F.transform(
            words,
            lambda w: F.concat(F.split(w, ""), F.array(F.lit(END))),
        ).alias("_syms_per_word"),
    )
    # replay merges: transform each word's symbol array through the fold
    for a, b, _ in merges:
        doc = doc.withColumn(
            "_syms_per_word",
            F.transform(
                "_syms_per_word",
                lambda syms: _merge_expr_on(syms, a, b),
            ),
        )
    return doc.select(
        *[c for c in df.columns],
        F.flatten("_syms_per_word").alias(out_col),
    )


def _merge_expr_on(syms: Column, a: str, b: str) -> Column:
    """_merge_expr generalized to an arbitrary array column."""
    merged = a + b
    init = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("p"),
    )

    def step(acc, s):
        hit = acc["p"].isNotNull() & (acc["p"] == F.lit(a)) & (s == F.lit(b))
        out_hit = F.concat(acc["out"], F.array(F.lit(merged)))
        out_miss = F.when(
            acc["p"].isNotNull(), F.concat(acc["out"], F.array(acc["p"]))
        ).otherwise(acc["out"])
        return (
            F.when(hit, F.struct(out_hit.alias("out"),
                                 F.lit(None).cast("string").alias("p")))
            .otherwise(F.struct(out_miss.alias("out"), s.alias("p")))
        )

    def fin(acc):
        return F.when(
            acc["p"].isNotNull(), F.concat(acc["out"], F.array(acc["p"]))
        ).otherwise(acc["out"])

    return F.aggregate(syms, init, step, fin)
