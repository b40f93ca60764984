"""Single-threaded pandas referee for the CDC replay (FIXTURES.md §5).

Independent of the engine: sorts the change log by ``lsn`` (stable,
dropping exact-duplicate lsns), applies the ops to a dict keyed by
``(repo, path)``, applies the schema registry, and emits the expected
final table with per-row ``sha256(content)``.

Semantics pinned here (and mirrored by the engine):
- last-writer-wins by lsn per key; ``update`` on an absent/deleted key
  upserts (tartare replace-or-add coverage-merge semantics,
  SURVEY.md §2 J1);
- ``delete`` removes the key from the final state;
- registry v>=2 ``add lang``: a null lang is backfilled from the
  path-extension default (Iceberg-like add-column-with-default applies
  to existing rows too);
- registry ``rename`` is metadata-only: the final schema carries the
  new name for ALL rows.
"""

from __future__ import annotations

import hashlib

import pandas as pd

from tartare_spark.fixtures import EXT_LANG, path_ext


def _sha(s: str) -> str:
    return hashlib.sha256(s.encode("utf-8")).hexdigest()


def replay_referee(
    events: pd.DataFrame, registry: list[dict] | None = None
) -> pd.DataFrame:
    """Replay ``events`` (columns per FIXTURES §2) → expected final state.

    Returns a DataFrame with columns
    ``repo path commit <lang|language> content _lsn _content_sha``.
    """
    ev = events.sort_values("lsn", kind="stable").drop_duplicates(
        subset=["lsn"], keep="first"
    )
    state: dict[tuple[str, str], dict] = {}
    for row in ev.itertuples(index=False):
        key = (row.repo, row.path)
        if row.op == "delete":
            state.pop(key, None)
        else:  # insert or update: both set the row (replace-or-add)
            state[key] = {
                "repo": row.repo,
                "path": row.path,
                "commit": row.commit,
                "lang": row.lang if isinstance(row.lang, str) else None,
                "content": row.content,
                "_lsn": int(row.lsn),
            }

    final_lsn = int(ev["lsn"].max()) if len(ev) else 0
    lang_name = "lang"
    backfill = False
    lang_dropped = False
    if registry:
        for r in sorted(registry, key=lambda r: r["version"]):
            if r["effective_lsn"] <= final_lsn:
                if r["action"] == "add" and r["column"] == "lang":
                    backfill = True
                elif r["action"] == "rename" and r["renamed_from"] == "lang":
                    lang_name = r["column"]
                elif r["action"] == "drop" and r["column"] == lang_name:
                    lang_dropped = True

    out = []
    for v in state.values():
        lang = v["lang"]
        if backfill and lang is None:
            lang = EXT_LANG.get(path_ext(v["path"]))
        rec = {
            "repo": v["repo"],
            "path": v["path"],
            "commit": v["commit"],
            lang_name: lang,
            "content": v["content"],
            "_lsn": v["_lsn"],
            "_content_sha": _sha(v["content"]),
        }
        if lang_dropped:
            del rec[lang_name]
        out.append(rec)
    cols = ["repo", "path", "commit", lang_name, "content", "_lsn", "_content_sha"]
    if lang_dropped:
        cols.remove(lang_name)
    return pd.DataFrame(out, columns=cols)
