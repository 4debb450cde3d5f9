"""Z-order (Morton) interleaved sort keys — multi-dimensional clustering
for the skipping stack (SURVEY.md §2.1 S9 layout layer; the Delta
`OPTIMIZE ZORDER BY` / Iceberg `RewriteDataFiles.zOrder` role).

A linear ``sort_order`` makes parquet row-group stats tight on ONE
column; a range filter on any other column still scans every row group.
Z-ordering sorts by the bit-interleaving of several columns' quantized
values, so rows close in the key are close in EVERY z dimension — each
row group covers a small hyper-rectangle instead of a thin full-width
slab, and parquet min/max pruning engages for a filter on ANY of the z
columns (at a small per-column cost vs a dedicated linear sort).

Quantization uses FIXED per-column domains declared at table-create time
(clamped outside, like Iceberg transform widths), NOT per-batch min/max:
a per-batch rescale would make the key ordering incomparable across
commits and would cost an extra stats job per trigger.  The whole key is
a pure JVM expression tree (shift/and/or arithmetic — whole-stage
codegen, no Python), so opting in costs one local sort per write and
nothing else.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: hard cap so the interleaved key fits a non-negative int64
MAX_KEY_BITS = 63


def validate_zorder(cols: "list[str]", domains: "dict[str, tuple]", bits: int) -> None:
    """Raise ValueError unless (cols, domains, bits) is a usable z-spec."""
    if len(cols) < 2:
        raise ValueError("zorder needs >= 2 columns (use sort_order for 1)")
    if len(set(cols)) != len(cols):
        raise ValueError(f"duplicate zorder columns: {cols}")
    if bits < 1 or bits * len(cols) > MAX_KEY_BITS:
        raise ValueError(
            f"zorder bits*ncols must be in [1, {MAX_KEY_BITS}]: "
            f"{bits}*{len(cols)}={bits * len(cols)}"
        )
    missing = [c for c in cols if c not in domains]
    if missing:
        raise ValueError(f"zorder columns missing a domain: {missing}")
    for c in cols:
        lo, hi = domains[c]
        if not (float(hi) > float(lo)):
            raise ValueError(f"zorder domain for {c!r} must have hi > lo: ({lo}, {hi})")


def _quantize(col: Column, lo: float, hi: float, bits: int, dtype: str = "") -> Column:
    """Order-preserving map of a numeric/timestamp/date column onto the
    integer grid [0, 2^bits): clamp to the declared domain, scale, floor.
    NULL quantizes to 0 (sorts first, like NULLS FIRST).

    DATE columns need their own numeric bridge: Spark 4 rejects
    ``cast(date as double)`` outright, so they go through ``unix_date``
    (tz-independent days since 1970-01-01) — their declared domain is in
    DAY units, while timestamps stay in epoch SECONDS (their ``double``
    cast)."""
    levels = (1 << bits) - 1
    num = F.unix_date(col) if dtype == "date" else col
    v = F.coalesce(num.cast("double"), F.lit(float(lo)))
    v = F.least(F.greatest(v, F.lit(float(lo))), F.lit(float(hi)))
    q = F.floor((v - F.lit(float(lo))) * F.lit(levels / (float(hi) - float(lo))))
    return F.least(q.cast("long"), F.lit(int(levels)))


def zorder_key(zspec: dict) -> Column:
    """The interleaved Morton key for ``zspec = {"cols": [...], "domains":
    {col: [lo, hi]}, "bits": b}`` — bit i of column j lands at key bit
    ``i * ncols + j``, so all columns' low bits interleave round-robin.
    Timestamp columns ride the same path via their epoch-seconds cast
    (``cast("double")`` on a timestamp yields epoch seconds); date
    columns ride ``unix_date`` via the per-column ``types`` map the table
    create path stamps into the spec (day-unit domains — see
    ``_quantize``)."""
    cols = list(zspec["cols"])
    bits = int(zspec["bits"])
    domains = zspec["domains"]
    types = zspec.get("types") or {}
    validate_zorder(cols, {c: tuple(domains[c]) for c in cols}, bits)
    k = len(cols)
    qs = [
        _quantize(
            F.col(c), float(domains[c][0]), float(domains[c][1]), bits,
            dtype=types.get(c, ""),
        )
        for c in cols
    ]
    key = F.lit(0).cast("long")
    for i in range(bits):
        for j, q in enumerate(qs):
            key = key + F.shiftleft(
                F.shiftright(q, i).bitwiseAND(F.lit(1)), i * k + j
            ).cast("long")
    return key


def zorder_key_py(values: "list", zspec: dict) -> int:
    """Pure-Python reference of ``zorder_key`` for one row (tests only)."""
    import datetime as _dt

    cols, bits, domains = list(zspec["cols"]), int(zspec["bits"]), zspec["domains"]
    levels = (1 << bits) - 1
    key = 0
    for j, c in enumerate(cols):
        lo, hi = float(domains[c][0]), float(domains[c][1])
        raw = values[j]
        if isinstance(raw, _dt.date) and not isinstance(raw, _dt.datetime):
            raw = (raw - _dt.date(1970, 1, 1)).days  # mirrors unix_date
        v = lo if raw is None else float(raw)
        v = min(max(v, lo), hi)
        q = min(int((v - lo) * (levels / (hi - lo))), levels)
        for i in range(bits):
            key |= ((q >> i) & 1) << (i * len(cols) + j)
    return key
