"""pandas-style suffix renaming for two-sided joins.

pandas ``merge(suffixes=("_x","_y"))`` renames ONLY the columns whose
names appear on both sides; non-overlapping names pass through
unchanged (reference relies on this — suffix columns asserted in
/root/reference/tests/infer_test.py:25-36). Spark joins instead produce
ambiguous duplicate names, so we rename before joining.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def suffix_plan(
    left_cols: list[str],
    right_cols: list[str],
    suffixes: tuple[str, str] = ("_x", "_y"),
) -> tuple[dict[str, str], dict[str, str]]:
    """Return rename maps (old -> new) for the left and right frames."""
    overlap = set(left_cols) & set(right_cols)
    lmap = {c: c + suffixes[0] if c in overlap else c for c in left_cols}
    rmap = {c: c + suffixes[1] if c in overlap else c for c in right_cols}
    clash = set(lmap.values()) & set(rmap.values())
    if clash:
        raise ValueError(f"suffix renaming still collides on {sorted(clash)}")
    return lmap, rmap


def apply_renames(df: DataFrame, renames: dict[str, str]) -> DataFrame:
    changed = {k: v for k, v in renames.items() if k != v}
    if not changed:
        return df
    return df.withColumnsRenamed(changed)
