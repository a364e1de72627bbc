"""Cross-SF oracle sweep as a pytest target (VERDICT r5 #7).

The default suite cross-checks every query at sf0.01
(test_oracle_queries.py); this sweep re-runs the identical check at
the OTHER fixture scale factors — the tool that caught four latent
scale-dependent defects at sf0.1 in round 5 (nondeterministic range
boundaries, window ties, float-rounding straddles; SCALE.md
'Cross-SF oracle sweeps').  Deselected by default (pytest.ini adds
`-m "not sweep"`); run with:

    make sweep            # or: python -m pytest -m sweep -q

`scripts/oracle_sweep.py` remains the standalone CLI form.
"""

from __future__ import annotations

import pytest

from finanalyzer_spark.plans import REGISTRY

from .oracle import compare, duck_connection

SWEEP_SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.1"]

ORACLE_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle)


@pytest.fixture(scope="module", params=SWEEP_SF_DIRS)
def sweep_ctx(request):
    con = duck_connection(request.param)
    yield request.param, con
    con.close()


@pytest.mark.sweep
@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle_at_sf(spark, sweep_ctx, name):
    sf_dir, duck = sweep_ctx
    spec = REGISTRY[name]
    spark_pdf = spec.fn(spark, sf_dir).toPandas()
    duck_pdf = duck.sql(spec.oracle).df()
    ok, msg = compare(spark_pdf, duck_pdf)
    assert ok, f"{name} @ {sf_dir}: {msg}"
