"""Deterministic change-event fixtures (FIXTURES.md, seed 42).

Pure-Python generator (pyarrow writer, no Spark needed) so the exact
same fixture is reproducible by engine tests, the pandas referee, the
bench harness, and the driver. Every payload column is a pure function
of ``(repo, path, lsn)`` so per-row ``sha256(content)`` — the judged
invariant (BASELINE.json:15) — is reproducible everywhere.

Reference analog: tartare's integration-test GTFS fixtures + the
automatic-update change-detection loop (conditional fetch by md5,
re-export only affected coverages), re-expressed as a binlog replay
oracle per BASELINE.json:6. [PK: tartare/tests/fixtures, tasks.py]
"""

from __future__ import annotations

import hashlib
import os
import random
from dataclasses import dataclass
from datetime import datetime, timedelta

import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
EXTS = ["py", "rs", "ts", "go", "java", "md", "toml"]
EXT_LANG = {
    "py": "python",
    "rs": "rust",
    "ts": "typescript",
    "go": "go",
    "java": "java",
    "md": "markdown",
    "toml": "toml",
}
TS_BASE = datetime(2026, 1, 1, 0, 0, 0)  # UTC (naive; session TZ is UTC)

CHANGE_EVENT_COLUMNS = ["lsn", "op", "repo", "path", "commit", "lang", "content", "ts"]


def _sha(s: str) -> str:
    return hashlib.sha256(s.encode("utf-8")).hexdigest()


def content_for(repo: str, path: str, lsn: int) -> str:
    """Row content — pure function of key+version (FIXTURES.md §2)."""
    return f"// {repo}:{path} v{lsn}\n" + _sha(f"{repo}|{path}|{lsn}")


def commit_for(repo: str, path: str, lsn: int) -> str:
    return _sha(f"{repo}/{path}@{lsn}")[:12]


def path_ext(path: str) -> str:
    return path.rsplit(".", 1)[-1]


@dataclass
class FixtureSpec:
    n_repos: int = 20
    paths_per_repo: int = 50
    n_events: int = 10_000
    # registry evolution points (FIXTURES.md §3): v2 adds `lang`,
    # v3 renames `lang` -> `language`.
    seed: int = SEED
    # approximate content payload size in bytes (bench knob: a real
    # source-code CDC row carries a whole file, KBs not tens of bytes;
    # affects only generate_change_events_fast — the pure-Python
    # correctness fixture keeps its pinned content_for() strings)
    content_len: int = 240

    @property
    def v2_lsn(self) -> int:
        return self.n_events // 3

    @property
    def v3_lsn(self) -> int:
        return 2 * self.n_events // 3


UNIT = FixtureSpec()
DRIVER = FixtureSpec(n_repos=100, paths_per_repo=100, n_events=100_000)


def _repo_weights(n_repos: int) -> list[float]:
    """Zipf-ish skew: hottest repo ~20% of events, top-5 ~50% (FIXTURES
    §2; the targets hold for n_repos >= 10). Always normalized to sum
    to 1 — numpy's rng.choice(p=...) in the fast generator rejects
    non-normalized weights (n_repos <= 5 used to sum to 0.5)."""
    w = [0.0] * n_repos
    w[0] = 0.20
    for i in range(1, min(5, n_repos)):
        w[i] = 0.075
    rest = max(n_repos - 5, 1)
    remaining = 1.0 - sum(w)
    for i in range(5, n_repos):
        w[i] = remaining / rest
    t = sum(w)
    return [x / t for x in w]


def _initial_path(j: int) -> str:
    ext = EXTS[j % len(EXTS)]
    return f"src/{j // 10}/f{j:05d}.{ext}"


def generate_change_events(spec: FixtureSpec = UNIT) -> dict[str, list]:
    """Generate the binlog fixture as columnar python lists, in ARRIVAL
    order (≈lsn order with ~5% out-of-order within a 1000-lsn horizon and
    ~1% verbatim duplicates). See FIXTURES.md §2 for the exact rules.
    """
    rng = random.Random(spec.seed)
    repos = [f"repo_{i:04d}" for i in range(spec.n_repos)]
    weights = _repo_weights(spec.n_repos)

    # key state: repo -> {path: live?}; new paths appear over time
    known_paths: dict[str, list[str]] = {
        r: [_initial_path(j) for j in range(spec.paths_per_repo)]
        for r in repos
    }
    live: dict[tuple[str, str], bool] = {}

    rows: list[tuple] = []
    for lsn in range(1, spec.n_events + 1):
        repo = rng.choices(repos, weights=weights, k=1)[0]
        make_new = rng.random() < 0.05
        if make_new:
            j = len(known_paths[repo])
            path = _initial_path(j)
            known_paths[repo].append(path)
        else:
            path = rng.choice(known_paths[repo])
        key = (repo, path)
        is_live = live.get(key, False)
        if not is_live:
            # first touch (or touch after delete): mostly insert, ~2%
            # of the time an update targeting an absent/deleted key
            # (must upsert — replace-or-add MERGE rule, SURVEY §2 J1)
            op = "update" if rng.random() < 0.02 else "insert"
            live[key] = True
        else:
            r = rng.random()
            if r < 0.10:
                op = "delete"
                live[key] = False
            else:
                op = "update"
        if op == "delete":
            content = ""
        else:
            content = content_for(repo, path, lsn)
        ext = path_ext(path)
        lang = EXT_LANG[ext] if lsn >= spec.v2_lsn else None  # null pre-v2
        ts = TS_BASE + timedelta(seconds=lsn)
        rows.append((lsn, op, repo, path, commit_for(repo, path, lsn), lang, content, ts))

    # Arrival order = lsn order perturbed by (a) ~5% out-of-order events
    # moved back within a 1000-lsn horizon (with lagged ts — late data),
    # (b) ~1% verbatim duplicates re-delivered shortly after the
    # original. Implemented as sort keys (O(n log n) — bench fixtures
    # reach 10^7 events, so no list.insert).
    n = len(rows)
    keys = [float(i) for i in range(n)]
    for idx in rng.sample(range(n), k=max(1, n // 20)):
        back = rng.randint(1, min(1000, idx)) if idx > 0 else 0
        if back:
            r = list(rows[idx])
            r[7] = r[7] - timedelta(seconds=back // 2)  # lagged ts (late data)
            rows[idx] = tuple(r)
            keys[idx] = idx - back - 0.5
    dup_rows, dup_keys = [], []
    for idx in rng.sample(range(n), k=max(1, n // 100)):
        dup_rows.append(rows[idx])
        dup_keys.append(keys[idx] + rng.randint(1, 200) + 0.25)
    all_keys = keys + dup_keys
    order = sorted(range(n + len(dup_rows)), key=all_keys.__getitem__)
    all_rows = rows + dup_rows

    cols: dict[str, list] = {c: [] for c in CHANGE_EVENT_COLUMNS}
    for i in order:
        for c, v in zip(CHANGE_EVENT_COLUMNS, all_rows[i]):
            cols[c].append(v)
    return cols


def events_arrow_table(cols: dict[str, list]) -> pa.Table:
    return pa.table(
        {
            "lsn": pa.array(cols["lsn"], pa.int64()),
            "op": pa.array(cols["op"], pa.string()),
            "repo": pa.array(cols["repo"], pa.string()),
            "path": pa.array(cols["path"], pa.string()),
            "commit": pa.array(cols["commit"], pa.string()),
            "lang": pa.array(cols["lang"], pa.string()),
            "content": pa.array(cols["content"], pa.string()),
            "ts": pa.array(cols["ts"], pa.timestamp("us")),
        }
    )


def stamp_files_in_order(directory: str) -> None:
    """Stamp strictly increasing mtimes on ``directory``'s files in
    sorted-name order. Spark's file stream source lists by (mtime,
    path); same-ms mtime ties between log chunks can flip their order,
    turning an in-order log into an out-of-order SOURCE — which is
    outside the manifest watermark fence's contract. A real binlog
    shipper's chunks carry monotone mtimes; test/bench harnesses call
    this to honor the same contract."""
    import time as _time

    t0 = _time.time()
    for i, name in enumerate(sorted(os.listdir(directory))):
        p = os.path.join(directory, name)
        os.utime(p, (t0 + i, t0 + i))


def write_events_parquet(
    out_dir: str, spec: FixtureSpec = UNIT, events_per_file: int = 100
) -> int:
    """Write the fixture as MANY small parquet files in arrival order so
    the streaming file source yields multiple micro-batches (FIXTURES §2).
    Returns the number of events written (including duplicates).
    """
    os.makedirs(out_dir, exist_ok=True)
    cols = generate_change_events(spec)
    table = events_arrow_table(cols)
    n = table.num_rows
    for fi, start in enumerate(range(0, n, events_per_file)):
        chunk = table.slice(start, events_per_file)
        pq.write_table(chunk, os.path.join(out_dir, f"events-{fi:06d}.parquet"))
    # strictly increasing mtimes in arrival order: a fast write loop
    # leaves same-ms ties, and Spark's file source lists by (mtime,
    # path) — a tie that flips between two streaming runs changes their
    # BATCHING, which makes across-batch dedup volumes (and the fence's
    # caught-redelivery counts) run-dependent. Observed as a rare
    # fence-vol > plain-vol flake in test_streaming_manifest_fence_path.
    stamp_files_in_order(out_dir)
    return n


def generate_change_events_fast(spec: FixtureSpec) -> pa.Table:
    """Vectorized (numpy) fixture generator for BENCH-scale streams.

    Same schema and the same zipf-ish repo skew as
    ``generate_change_events`` but ~100x faster; used only for
    throughput benchmarks (the pure-Python generator stays the
    correctness ground truth — its per-key op state machine is what the
    pandas referee replays). Content here is deterministic but cheap:
    the engine computes ``sha2(content, 256)`` itself, so the invariant
    is still exercised end to end.
    """
    import numpy as np

    n = spec.n_events
    rng = np.random.default_rng(spec.seed)

    weights = np.asarray(_repo_weights(spec.n_repos))
    repo_idx = rng.choice(spec.n_repos, size=n, p=weights)
    path_idx = rng.integers(0, spec.paths_per_repo, size=n)
    lsn = np.arange(1, n + 1, dtype=np.int64)

    # op mix ≈ the stateful generator's steady state; exact ratios are
    # irrelevant to the engine (insert/update are both upserts, delete
    # is a tombstone) — only the shuffle/merge volume matters.
    u = rng.random(n)
    is_del = u < 0.08
    is_ins = u > 0.70

    # ~5% out-of-order arrivals within a 1000-lsn horizon, ~1% dups.
    arrival = lsn.astype(np.float64)
    late = rng.choice(n, size=max(1, n // 20), replace=False)
    arrival[late] -= rng.integers(1, 1000, size=late.size) + 0.5
    dup = rng.choice(n, size=max(1, n // 100), replace=False)

    repos = np.array([f"repo_{i:04d}" for i in range(spec.n_repos)])
    exts = np.array(EXTS)
    paths = np.array(
        [f"src/{j // 10}/f{j:05d}.{e}" for j, e in
         zip(range(spec.paths_per_repo), np.tile(exts, spec.paths_per_repo // len(EXTS) + 1))]
    )
    langs = np.array([EXT_LANG[p.rsplit(".", 1)[-1]] for p in paths])

    repo_s = repos[repo_idx]
    path_s = paths[path_idx]
    # cheap deterministic strings (vectorized via pandas str ops)
    import pandas as pd

    lsn_s = pd.Series(lsn).astype(str)
    mix = (lsn * np.int64(2654435761)) & np.int64(0x7FFFFFFFFFFFFFFF)
    reps = max(1, spec.content_len // 15)
    content = ("// " + pd.Series(repo_s) + ":" + pd.Series(path_s) + " v"
               + lsn_s + "\n" + pd.Series(mix).apply(lambda v: f"{v:015x}") * reps)
    content = content.where(~pd.Series(is_del), "")
    commit = pd.Series(((lsn * 1099511628211) & 0xFFFFFFFFFFFF)).apply(
        lambda v: f"{v:012x}"
    )
    lang = pd.Series(langs[path_idx]).where(lsn >= spec.v2_lsn, None)
    op = np.where(is_del, "delete", np.where(is_ins, "insert", "update"))
    ts = pd.Timestamp(TS_BASE) + pd.to_timedelta(lsn, unit="s")

    order = np.argsort(
        np.concatenate([arrival, arrival[dup] + rng.integers(1, 200, size=dup.size) + 0.25])
    )
    idx = np.concatenate([np.arange(n), dup])[order]

    return pa.table(
        {
            "lsn": pa.array(lsn[idx], pa.int64()),
            "op": pa.array(op[idx], pa.string()),
            "repo": pa.array(repo_s[idx], pa.string()),
            "path": pa.array(path_s[idx], pa.string()),
            "commit": pa.array(commit.to_numpy()[idx], pa.string()),
            "lang": pa.array(lang.to_numpy()[idx], pa.string()),
            "content": pa.array(content.to_numpy()[idx], pa.string()),
            "ts": pa.array(pd.Series(ts).to_numpy()[idx], pa.timestamp("us")),
        }
    )


def write_events_parquet_fast(
    out_dir: str, spec: FixtureSpec, events_per_file: int = 100_000
) -> int:
    """Fast path of ``write_events_parquet`` for bench fixtures."""
    os.makedirs(out_dir, exist_ok=True)
    table = generate_change_events_fast(spec)
    n = table.num_rows
    for fi, start in enumerate(range(0, n, events_per_file)):
        pq.write_table(
            table.slice(start, events_per_file),
            os.path.join(out_dir, f"events-{fi:06d}.parquet"),
        )
    return n


def registry_rows(spec: FixtureSpec = UNIT) -> list[dict]:
    """Schema-registry fixture (FIXTURES.md §3): v1 base, v2 add `lang`
    with a path-extension default, v3 rename `lang` -> `language`."""
    default_expr = (
        "element_at(map("
        + ", ".join(f"'{e}', '{l}'" for e, l in EXT_LANG.items())
        + "), regexp_extract(path, '\\\\.([a-z0-9]+)$', 1))"
    )
    return [
        {
            "version": 1,
            "effective_lsn": 0,
            "action": "base",
            "column": None,
            "renamed_from": None,
            "default_expr": None,
        },
        {
            "version": 2,
            "effective_lsn": spec.v2_lsn,
            "action": "add",
            "column": "lang",
            "renamed_from": None,
            "default_expr": default_expr,
        },
        {
            "version": 3,
            "effective_lsn": spec.v3_lsn,
            "action": "rename",
            "column": "language",
            "renamed_from": "lang",
            "default_expr": None,
        },
    ]
