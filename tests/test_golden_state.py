"""Golden-file test (SURVEY.md §5.2 item 7, tartare-style golden-output
assertion [PK: tartare tests/functional fixtures]): the engine's final
lake state for the pinned seed-42 UNIT fixture must equal the COMMITTED
parquet snapshot in tests/golden/, byte-for-byte per cell.

This is independent of the pandas referee: if the referee and engine
ever co-drift (a shared misunderstanding of the semantics), the
committed artifact still fails. Regenerate deliberately with::

    python - <<'PY'
    import pandas as pd
    from tartare_spark.fixtures import UNIT, generate_change_events, registry_rows
    from tartare_spark.oracle import replay_referee
    exp = replay_referee(pd.DataFrame(generate_change_events(UNIT)), registry_rows(UNIT))
    exp.sort_values(["repo", "path"]).reset_index(drop=True).to_parquet(
        "tests/golden/unit_final_state.parquet", index=False)
    PY
"""

import os

import pandas as pd

from tartare_spark.fixtures import UNIT, registry_rows
from tartare_spark.lake.table import LakeTable
from tartare_spark.operators.apply import replay_batches
from tartare_spark.registry import SchemaRegistry

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "unit_final_state.parquet")


def test_final_state_matches_committed_golden(spark, unit_events_dir, tmp_path):
    golden = pd.read_parquet(GOLDEN)
    lake = LakeTable.create(str(tmp_path / "lake_gold"), num_buckets=16)
    reg = SchemaRegistry(registry_rows(UNIT))
    events = spark.read.parquet(unit_events_dir)
    replay_batches(spark, lake, events, num_chunks=6, registry=reg)
    eng = (
        lake.snapshot(spark, registry=reg)
        .select(*golden.columns.tolist())
        .toPandas()
        .sort_values(["repo", "path"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(eng, golden, check_dtype=False)
