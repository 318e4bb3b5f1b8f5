"""Static lint over registered oracle SQL strings.

DuckDB's ``SUM`` over integer columns returns HUGEINT; pandas surfaces it as
float64, and the driver's dtype-sensitive canonical hash then mismatches
Spark's BIGINT even when every value is identical.  This bit the repo twice
(r1 ``doc_fingerprints``, r3 ``doc_packing_stats``).

Two layers of defense:
  1. ``tests/diffcheck.py`` asserts dtype-class equality per column, so an
     uncast sum fails ``test_oracle_parity`` (the real guard — it runs both
     engines).
  2. This ratchet: any NEW windowed ``SUM`` that is not ``CAST``-wrapped must
     be consciously added to the allowlist below (the current four are benign
     because both engines surface the downstream column as float).
"""

from __future__ import annotations

import re

from contentwise_impressions_spark.plans import all_oracle_sql

_WINDOWED_SUM = re.compile(r"SUM\s*\([^)]*\)\s*OVER", re.IGNORECASE)
_CAST_PREFIX = re.compile(r"CAST\s*\(\s*\Z")

#: windowed sums verified benign by the dtype-class check in diffcheck.py
#: (driver-green as of r3; user_sessions green in the local strict parity run)
ALLOWED_UNCAST = {
    ("toppop_eval_metrics", "SUM(is_hit) OVER"),
    ("toppop_eval_multi_cutoff", "SUM(is_hit) OVER"),
    ("user_sessions", "SUM(new_sess) OVER"),
    # same construct as user_sessions: sess_id is GROUP-BY-only, never an
    # output column; strict parity green at sf0.001/0.01/0.1 (r8)
    ("stream_sessionization_counts", "SUM(new_sess) OVER"),
    ("users_covering_traffic", "SUM(cnt) OVER"),
    # o_totalprice is DOUBLE: DuckDB sums doubles as DOUBLE (the HUGEINT
    # promotion only bites integer inputs); strict parity green at sf0.001
    ("rolling_7d_revenue", "SUM(o_totalprice) OVER"),
    # l_quantity is DOUBLE (same benign case as rolling_7d_revenue); the
    # running/total sums feed only the crossing filter and the float
    # total_qty output; strict parity green at sf0.001 and sf0.01 (r9)
    ("nation_weighted_median_price", "SUM(l_quantity) OVER"),
    # the windowed sum is ONLY a divisor under CAST(cnt AS DOUBLE)/... —
    # HUGEINT/DOUBLE division yields DOUBLE, and the projected columns are
    # cnt (cast BIGINT) + the rounded prob; strict parity green at sf0.01
    # (round 10, vanilla-session driver replica)
    ("event_transition_matrix", "SUM(cnt) OVER"),
}


def test_driver_priority_names_are_registered():
    """driver_priority silently drops names missing from the registry, so a
    typo in the hand-maintained 50-name rotation would quietly shrink the
    verification front.  Pin: every DRIVER_PRIORITY entry is a registered
    query, no duplicates, and the front respects the 50-per-round budget."""
    from contentwise_impressions_spark.plans import all_queries
    from contentwise_impressions_spark.plans.registry import DRIVER_PRIORITY

    registered = set(all_queries())
    unknown = [n for n in DRIVER_PRIORITY if n not in registered]
    assert not unknown, f"DRIVER_PRIORITY names not in registry: {unknown}"
    dupes = [n for n in set(DRIVER_PRIORITY) if DRIVER_PRIORITY.count(n) > 1]
    assert not dupes, f"duplicate DRIVER_PRIORITY names: {dupes}"
    assert len(DRIVER_PRIORITY) <= 50, (
        f"front exceeds the driver's 50-query budget: {len(DRIVER_PRIORITY)}"
    )


def test_windowed_sums_cast_or_allowlisted():
    offenders = []
    for name, sql in all_oracle_sql().items():
        for m in _WINDOWED_SUM.finditer(sql):
            if _CAST_PREFIX.search(sql[max(0, m.start() - 60) : m.start()]):
                continue
            key = (name, re.sub(r"\s+", " ", m.group(0)))
            if key not in ALLOWED_UNCAST:
                offenders.append(key)
    assert not offenders, (
        "uncast windowed SUM in oracle SQL (DuckDB HUGEINT -> float64 "
        "hash-mismatch risk); wrap in CAST(... AS BIGINT) or allowlist "
        f"after verifying dtype parity: {offenders}"
    )
