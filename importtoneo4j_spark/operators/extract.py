"""Triple / mention extraction — the engine's "parser UDF".

Analog of the reference's external parser extension point
(VEPAnnotationv82.parseAnnotation(), VariantDatabase.java:365,377: one raw
string -> many typed annotation records, then HashSet-dedup) — re-expressed
as an Arrow-batched ``mapInPandas`` fan-out: each text row yields 0..N
assertion rows. All regex work is pandas-vectorized (``str.extractall``);
there is no per-row Python (input_hint requirement).

Assertion grammar (see datagen.py):
  [[SUBJ]] <pred> [[OBJ]]     pred in {works_at, located_in, reports_to,
                              uses, manages}            -> kind='triple'
  [[A]] aka [[B]]                                       -> kind='same_as'
  [[S]] invoked:<tool> [[O]]  dynamic predicate from data (reference
                              VariantDatabase.java:463,476)
                              pred='invoked_<tool>'     -> kind='triple'
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ASSERTION_PATTERN = (
    r"\[\[(?P<subj>[^\[\]]+)\]\]\s+"
    r"(?P<verb>works_at|located_in|reports_to|uses|manages|aka|invoked:\w+)\s+"
    r"\[\[(?P<obj>[^\[\]]+)\]\]"
)

EXTRACTED_DDL = (
    "conv_id string, turn_idx int, role string, seq int, "
    "subj_surface string, pred string, obj_surface string, "
    "kind string, quality float"
)


def _extract_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    matches = pdf["text"].str.extractall(ASSERTION_PATTERN)
    if matches.empty:
        return pd.DataFrame(
            {
                "conv_id": pd.Series([], dtype="string"),
                "turn_idx": pd.Series([], dtype="int32"),
                "role": pd.Series([], dtype="string"),
                "seq": pd.Series([], dtype="int32"),
                "subj_surface": pd.Series([], dtype="string"),
                "pred": pd.Series([], dtype="string"),
                "obj_surface": pd.Series([], dtype="string"),
                "kind": pd.Series([], dtype="string"),
                "quality": pd.Series([], dtype="float32"),
            }
        )
    row_pos = matches.index.get_level_values(0)
    verb = matches["verb"]
    is_aka = verb.eq("aka")
    is_tool = verb.str.startswith("invoked:")
    pred = verb.mask(is_aka, "same_as").str.replace(":", "_", regex=False)
    out = pd.DataFrame(
        {
            "conv_id": pdf["conv_id"].to_numpy()[row_pos],
            "turn_idx": pdf["turn_idx"].to_numpy()[row_pos],
            "role": pdf["role"].to_numpy()[row_pos],
            "seq": pdf["seq"].to_numpy()[row_pos],
            "subj_surface": matches["subj"].str.strip().to_numpy(),
            "pred": pred.to_numpy(),
            "obj_surface": matches["obj"].str.strip().to_numpy(),
            "kind": is_aka.map({True: "same_as", False: "triple"}).to_numpy(),
            "quality": is_tool.map({True: 0.8, False: 1.0}).astype("float32").to_numpy(),
        }
    )
    return out


def extract_assertions(transcripts: DataFrame) -> DataFrame:
    """valid, stably-ordered transcripts -> exploded assertion rows.

    Column-pruned before the UDF so the Arrow transfer carries only what the
    parser needs; the fan-out happens inside pandas (reference's
    one-record -> many-annotations shape, VariantDatabase.java:374-384).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _extract_batch(pdf)

    pruned = (
        transcripts
        # JVM-side prefilter: a row without a mention marker can produce no
        # assertion, so it never pays the Arrow transfer or the Python regex
        # (~1/3 of turns are noise/edge-case text). Pushed into the scan.
        .filter(F.col("text").contains("[["))
        .select("conv_id", "turn_idx", "role", "seq", "text")
    )
    return pruned.mapInPandas(run, schema=EXTRACTED_DDL)


def with_dynamic_pred_stats(extracted: DataFrame) -> DataFrame:
    """Predicate vocabulary as data (never N DataFrames): per-pred counts."""
    return extracted.groupBy("pred").agg(F.count("*").alias("n")).orderBy("pred")
