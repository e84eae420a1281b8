"""Every plan-linter warn must carry a standing adjudication.

The full-catalog plan lint (``python tools/lint_catalog.py`` with no
query filter — part of the round ritual) persists its warn-tier
findings to ``tools/lint_warns.json``. These tests pin the contract
the r13 review asked for: a warn the linter can see but KNOWN_BENIGN
cannot explain fails the suite instead of drifting unexplained, and
adjudications for queries that no longer exist (renames) get flagged
as dead weight.

No Spark session: the snapshot is produced by the (minutes-long)
linter run; the tests here are pure-Python set checks over it.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

from lint_catalog import KNOWN_BENIGN, SNAPSHOT_PATH  # noqa: E402

SNAPSHOT = REPO / SNAPSHOT_PATH


class TestLintAdjudications:
    def _snapshot_pairs(self) -> set[tuple[str, str]]:
        assert SNAPSHOT.exists(), (
            f"{SNAPSHOT_PATH} missing — run the full-catalog linter "
            "(python tools/lint_catalog.py) to regenerate it")
        return {tuple(p) for p in json.loads(SNAPSHOT.read_text())}

    def test_no_bare_warns(self):
        """Every warn the last full lint run saw is adjudicated."""
        bare = sorted(self._snapshot_pairs() - set(KNOWN_BENIGN))
        assert not bare, (
            "plan-linter warns without a KNOWN_BENIGN adjudication "
            f"(add the scale argument to tools/lint_catalog.py): {bare}")

    def test_no_dead_adjudications_for_missing_queries(self):
        """KNOWN_BENIGN keys must name queries that still exist —
        a rename would otherwise leave the old adjudication matching
        nothing while the renamed query's warn goes bare."""
        from spark_expectations_spark.queries import QUERIES

        dead = sorted({q for q, _ in KNOWN_BENIGN} - set(QUERIES))
        assert not dead, f"adjudications for unknown queries: {dead}"

    def test_snapshot_shape(self):
        """Snapshot rows are (query, rule) pairs over known rule ids."""
        rules = {r for _, r in self._snapshot_pairs()}
        known = {"filter-not-pushed", "single-partition-exchange",
                 "cartesian-product"}
        assert rules <= known, f"unexpected lint rule ids: {rules - known}"
