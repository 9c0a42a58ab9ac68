"""BPE tokenizer APPLICATION (encode) at corpus scale.

`plans/analytics.py:vocab_bpe_train` learns the merge table; this module
applies it. Two algorithmically-equivalent forms exist:

- **sequential**: apply each merge, in training order, as a global
  replace over the word (Sennrich et al. 2016's original formulation —
  what the trainer's framed-replace and its DuckDB oracle do). Cost is
  O(n_merges) passes: fine for the 8-merge fixture, hopeless for a real
  50k-merge tokenizer.
- **rank-priority** (this module): per word, repeatedly merge the
  adjacent pair with the LOWEST training rank until none applies (the
  GPT-2-style encoder). Equivalent output because a merge's operands
  always have strictly lower rank than the merge itself, so the
  priority order replays the training order exactly. Cost is
  O(len(word) * log) per word, independent of merge-table size.

The equivalence is not just asserted: the `vocab_bpe_encode` registry
entry runs THIS encoder on Spark and the SEQUENTIAL replay in DuckDB,
and the driver hash-matches the outputs.

Scale shape: encoding is applied to the DISTINCT WORD VOCABULARY (the
deployment pattern — vocab-scale work, ~10^6 rows at 100 TB), then
joined back to the corpus word stream; the per-word sequential loop
lives in an Arrow-batched mapInPandas (a legitimate Pandas-UDF use:
a data-dependent while-loop no relational operator expresses)."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def bpe_encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Rank-priority BPE for one word: merge the lowest-rank adjacent
    pair until no pair is mergeable. Pure function — the golden tests
    drive it directly."""
    syms = list(word)
    while len(syms) >= 2:
        best_rank = None
        best_i = -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def encode_words(
    df: DataFrame,
    merges: list[tuple[str, str]],
    word_col: str = "word",
) -> DataFrame:
    """Add `tokens` (array<string>) to a frame of words by applying the
    merge table with the rank-priority encoder.

    mapInPandas, Arrow-batched; the merge table rides into the workers
    via task-closure serialization (a list of string pairs — KBs for
    8 merges, a few MB for a production 50k table; for the latter a
    SparkContext.broadcast would dedupe per-executor copies, same
    plumbing)."""
    ranks = {(a, b): i for i, (a, b) in enumerate(merges)}
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField("tokens", T.ArrayType(T.StringType()))]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pdf = pdf.copy()
            pdf["tokens"] = [
                bpe_encode_word(w, ranks) for w in pdf[word_col].astype(str)
            ]
            yield pdf

    return df.mapInPandas(batches, schema=out_schema)
