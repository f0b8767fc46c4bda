"""Generation-pointer layout for materialized index tables.

The dedup and IVF indexes (operators/dedup_index.py, operators/ivf.py) are
long-lived on-disk layouts that get compacted on a maintenance cadence. The
r4-era compaction swapped directories with two ``os.rename`` calls — atomic
on POSIX, but object stores (where a 100 TB index actually lives) have no
rename, and the two-rename window briefly left NO live table. This module
replaces that with the manifest-pointer flip the streaming state store
already uses (streaming/pipeline.py: `_write_manifest`):

- each logical table resolves through ``_CURRENT.json`` in the index root:
  ``{"digests": "digests.g3", ...}``; a table absent from the pointer (or a
  missing pointer file) resolves to its plain directory name, so pre-pointer
  indexes keep working unchanged
- compaction writes a brand-new generation directory (invisible to readers),
  then atomically republishes the pointer (``os.replace`` locally — a single
  object PUT on S3/GCS, which is atomic at the object level), then garbage-
  collects unreferenced generations
- a crash before the flip leaves a dangling new generation (GC'd by the next
  compaction); a crash after the flip leaves the old generation (same). At
  NO point is the table unreadable — the failure mode the rename swap had.

Compaction still assumes no concurrent writer on the same table (offline
maintenance, like the rename version did); readers are never blocked.
"""

from __future__ import annotations

import json
import os

POINTER_FILE = "_CURRENT.json"


def _pointer_path(root: str) -> str:
    return os.path.join(root, POINTER_FILE)


def read_pointer(root: str) -> dict:
    """The current table->directory mapping ({} when no flip happened yet)."""
    p = _pointer_path(root)
    if not os.path.isfile(p):
        return {}
    with open(p) as f:
        return json.load(f)


def resolve_table(root: str, table: str) -> str:
    """Absolute path of the CURRENT generation of ``table`` (falls back to
    the plain directory for indexes that predate the pointer)."""
    return os.path.join(root, read_pointer(root).get(table, table))


def next_generation(root: str, table: str) -> str:
    """An unused generation directory name ``<table>.g<N>``."""
    n = 0
    while os.path.exists(os.path.join(root, f"{table}.g{n}")):
        n += 1
    return f"{table}.g{n}"


def publish_generation(root: str, table: str, gen_name: str) -> None:
    """Atomically repoint ``table`` at ``gen_name``: read-modify-write of
    the pointer file through a temp + ``os.replace`` (locally atomic; the
    object-store equivalent is one PUT of the pointer object)."""
    cur = read_pointer(root)
    cur[table] = gen_name
    tmp = _pointer_path(root) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(cur, f)
    os.replace(tmp, _pointer_path(root))


def gc_generations(root: str, table: str) -> None:
    """Remove every directory of ``table`` the pointer does not reference:
    stale generations from completed flips and dangling ones from crashed
    compactions. Safe to run any time no compaction is in flight."""
    import shutil

    live = read_pointer(root).get(table, table)
    for name in os.listdir(root):
        if name == live:
            continue
        if name == table or name.startswith(table + ".g"):
            shutil.rmtree(os.path.join(root, name), ignore_errors=True)
