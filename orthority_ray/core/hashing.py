"""Deterministic integer hashing + geocode spec shared by the Ray engine and
the DuckDB oracle SQL.

Every formula here is pure non-negative int64 arithmetic so that the numpy
implementation (engine side) and the generated ANSI-SQL (oracle side) produce
bit-identical values.  Rules:

- never take ``%`` of a negative value (numpy floors toward the divisor sign,
  DuckDB/C truncate — they disagree on negatives);
- keep every intermediate < 2**63 (doc_id <= ~1.2e7 at sf0.1; the multipliers
  keep products < 4e16).  At true 10^12-doc scale the multiplies would be done
  in uint64 with an explicit wrap — noted, not needed at sandbox scale;
- final float values are produced by a single int->float64 conversion followed
  by one division and one subtraction, which IEEE-754 rounds identically in
  numpy and DuckDB.

The geocode itself is the "url -> location" map of SURVEY.md §7.1: a Zipf-ish
concentration of documents onto ~10 hot sites (50% of docs on 10 sites, 30% on
100, 20% spread over 1000) so a few cells are ~10^3x hotter than background —
this exercises the skew-salting path (SURVEY.md §4 "Skew / stragglers").
"""

from __future__ import annotations

import numpy as np

# Knuth / xxhash-prime multiplicative hashes, mod 2^32.
H1_MULT = 2654435761
H2_MULT = 2246822519
M32 = 4294967296

# world grid in millidegrees: lon in [0, 360000) -> [-180, 180); lat in
# [0, 170000) -> [-85, 85).
LON_RANGE = 360_000
LAT_RANGE = 170_000
SITE_LON_MULT = 7919
SITE_LAT_MULT = 104_729
JITTER = 2001  # +/- 1 degree of jitter around the site center


def doc_hashes(doc_id: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Two independent 32-bit hashes of ``doc_id`` (int64 in, int64 out)."""
    d = doc_id.astype(np.int64)
    return (d * H1_MULT) % M32, (d * H2_MULT) % M32


def site_of(h1: np.ndarray) -> np.ndarray:
    """Skewed site assignment: 50% of docs -> sites 0..9, 30% -> 0..99,
    20% -> 0..999 (Zipf-ish three-band concentration)."""
    r = h1 % 1000
    return np.where(r < 500, r % 10, np.where(r < 800, r % 100, r))


def site_center_milli(site: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    return (site * SITE_LON_MULT) % LON_RANGE, (site * SITE_LAT_MULT) % LAT_RANGE


def geocode_milli(doc_id: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """doc_id -> (lon_milli, lat_milli) integer millidegree coordinates.

    The jitter terms add (JITTER mod) - 1000 while staying non-negative
    before every ``%`` (see module docstring).
    """
    h1, h2 = doc_hashes(doc_id)
    site = site_of(h1)
    clon, clat = site_center_milli(site)
    lon_milli = (clon + h2 % JITTER + (LON_RANGE - 1000)) % LON_RANGE
    lat_milli = (clat + (h2 // 2048) % JITTER + (LAT_RANGE - 1000)) % LAT_RANGE
    return lon_milli, lat_milli


def milli_to_deg(lon_milli: np.ndarray, lat_milli: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Single int->float64 conversion + one division + one subtraction each —
    the same op sequence the oracle SQL uses, so results are bit-identical."""
    lon = lon_milli.astype(np.float64) / 1000.0 - 180.0
    lat = lat_milli.astype(np.float64) / 1000.0 - 85.0
    return lon, lat


# ---------------------------------------------------------------------------
# SQL fragments (DuckDB) computing the same values from a column `doc_id`.
# Kept adjacent to the numpy code so the two can never drift apart.
# ---------------------------------------------------------------------------

SQL_H1 = f"((doc_id * {H1_MULT}) % {M32})"
SQL_H2 = f"((doc_id * {H2_MULT}) % {M32})"
SQL_SITE = (
    f"(CASE WHEN {SQL_H1} % 1000 < 500 THEN ({SQL_H1} % 1000) % 10 "
    f"WHEN {SQL_H1} % 1000 < 800 THEN ({SQL_H1} % 1000) % 100 "
    f"ELSE {SQL_H1} % 1000 END)"
)
SQL_LON_MILLI = (
    f"((({SQL_SITE} * {SITE_LON_MULT}) % {LON_RANGE} + {SQL_H2} % {JITTER} "
    f"+ {LON_RANGE - 1000}) % {LON_RANGE})"
)
SQL_LAT_MILLI = (
    f"((({SQL_SITE} * {SITE_LAT_MULT}) % {LAT_RANGE} + ({SQL_H2} // 2048) % {JITTER} "
    f"+ {LAT_RANGE - 1000}) % {LAT_RANGE})"
)
SQL_LON = "(CAST(lon_milli AS DOUBLE) / 1000.0 - 180.0)"
SQL_LAT = "(CAST(lat_milli AS DOUBLE) / 1000.0 - 85.0)"


def sql_flit(v: float) -> str:
    """Exact float literal for DuckDB: repr() round-trips the double, and the
    CAST stops DuckDB from typing short literals as DECIMAL (whose chained
    multiplications overflow)."""
    return f"CAST({v!r} AS DOUBLE)"


def knuth32(k: "np.ndarray") -> "np.ndarray":
    """The engine's ONE integer key hash (Knuth multiplicative, 32-bit
    range): every int bucketing/salting path must use this so join
    bucketing, salting and partitioning can never drift apart (r3 review;
    the formula also appears verbatim inside SQL oracle strings, so the
    constants are frozen)."""
    return (k.astype(np.int64) * 2654435761) % 4294967296
