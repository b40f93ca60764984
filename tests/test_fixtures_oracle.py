"""M0: fixture determinism + referee sanity (SURVEY.md §7)."""

import pandas as pd

from tartare_spark.fixtures import (
    UNIT,
    FixtureSpec,
    generate_change_events,
    registry_rows,
)
from tartare_spark.oracle import replay_referee


def _events_df(spec=UNIT) -> pd.DataFrame:
    return pd.DataFrame(generate_change_events(spec))


def test_fixture_deterministic():
    a = generate_change_events(UNIT)
    b = generate_change_events(UNIT)
    assert a == b


def test_fixture_shape():
    df = _events_df()
    assert len(df) >= UNIT.n_events  # duplicates added
    assert set(df["op"].unique()) == {"insert", "update", "delete"}
    # zipf skew: hottest repo ~20%
    top = df["repo"].value_counts(normalize=True)
    assert 0.15 < top.iloc[0] < 0.25
    # duplicates exist
    assert df["lsn"].duplicated().any()
    # out-of-order arrivals exist
    assert (df["lsn"].diff().dropna() < 0).any()
    # lang null before v2
    pre = df[df["lsn"] < UNIT.v2_lsn]
    assert pre["lang"].isna().all()


def test_referee_basics():
    ev = pd.DataFrame(
        {
            "lsn": [1, 2, 3, 4, 5],
            "op": ["insert", "update", "delete", "update", "insert"],
            "repo": ["r", "r", "r", "r", "r2"],
            "path": ["a", "a", "a", "a", "b"],
            "commit": ["c1", "c2", "c3", "c4", "c5"],
            "lang": [None] * 5,
            "content": ["x1", "x2", "", "x4", "x5"],
            "ts": pd.to_datetime(["2026-01-01"] * 5),
        }
    )
    out = replay_referee(ev)
    # update-after-delete upserts (replace-or-add)
    assert len(out) == 2
    row = out[out["path"] == "a"].iloc[0]
    assert row["content"] == "x4" and row["_lsn"] == 4


def test_referee_delete_wins_when_last():
    ev = pd.DataFrame(
        {
            "lsn": [1, 2],
            "op": ["insert", "delete"],
            "repo": ["r", "r"],
            "path": ["a", "a"],
            "commit": ["c1", "c2"],
            "lang": [None, None],
            "content": ["x1", ""],
            "ts": pd.to_datetime(["2026-01-01"] * 2),
        }
    )
    assert len(replay_referee(ev)) == 0


def test_referee_registry_backfill_and_rename():
    spec = FixtureSpec(n_repos=5, paths_per_repo=5, n_events=300)
    ev = _events_df(spec)
    out = replay_referee(ev, registry_rows(spec))
    assert "language" in out.columns and "lang" not in out.columns
    # every surviving row has a non-null language after backfill
    assert out["language"].notna().all()
