"""Atomic generation-pointer protocol for blue/green streaming state.

Every standing-state compaction in this package
(`compact_near_dedup_state`, `compact_hll_registers`, ...) is
blue/green: the compacted tables land in a NEW directory and the
caller repoints the stream afterwards, because a same-dir rewrite has
a crash window where half-deleted state re-admits duplicates. Until
r10 that final switch was a manual ops step — and a typo'd dir
silently re-admits every previously-seen near-duplicate (the exact
hazard the compact functions document).

This module makes the switch a first-class, atomic, crash-safe
operation. Layout:

    state_root/
        _CURRENT            # single line: the active generation name
        gen-000001/...      # one complete state tree per generation
        gen-000002/...

- Streams call `resolve_state_dir(root)` at EVERY micro-batch: if a
  `_CURRENT` pointer exists the active generation is used, otherwise
  the path itself is the state dir (plain un-rooted dirs keep working
  unchanged, so adoption is opt-in per pipeline).
- Compactions write the new generation COMPLETELY, then flip the
  pointer LAST via write-temp + `os.replace` — atomic on POSIX, so a
  crash at any earlier point leaves the old generation active and the
  half-built one unreferenced (garbage to delete, never live state).
- Because resolution happens per batch, a compact+switch takes effect
  on the NEXT micro-batch without restarting the stream.

The pointer file lives on the driver-visible filesystem (`os` calls,
local paths or mounts): state roots here are plain directories, the
same assumption the rest of the streaming state code already makes.
On an object store the identical protocol works with any
atomic-rename primitive; only `_write_pointer` would change.
"""
from __future__ import annotations

import os
import re

POINTER = "_CURRENT"
_GEN_RE = re.compile(r"^gen-(\d{6})$")


def generation_name(n: int) -> str:
    """gen-000001-style name for generation `n` (1-based)."""
    if n < 1:
        raise ValueError(f"generation numbers are 1-based (got {n})")
    return f"gen-{n:06d}"


def resolve_state_dir(path: str) -> str:
    """The directory a stream should read/write state under RIGHT
    NOW: `path/<_CURRENT contents>` when a pointer exists, else
    `path` itself (un-rooted legacy dirs). Called per micro-batch so
    a pointer flip lands on the next batch without a restart."""
    p = os.path.join(path, POINTER)
    if os.path.isfile(p):
        with open(p) as fh:
            name = fh.read().strip()
        if not name:
            # An empty pointer is corruption, not "no pointer": falling
            # back to the root would silently split state across dirs.
            raise ValueError(f"empty {POINTER} pointer at {p}")
        gen = os.path.join(path, name)
        if not os.path.isdir(gen):
            # Every legal writer creates the generation dir before the
            # pointer names it (init, compact+switch), so a pointer at
            # a missing dir means the generation was deleted out from
            # under the root — and treating it as "no state yet" would
            # silently re-admit every previously-seen duplicate.
            raise ValueError(
                f"{POINTER} at {p} names missing generation {name!r} "
                "— state deleted or root corrupted; refusing to treat "
                "it as an empty first batch")
        return gen
    return path


def current_generation(root: str) -> str | None:
    """The active generation NAME, or None if `root` has no pointer."""
    p = os.path.join(root, POINTER)
    if not os.path.isfile(p):
        return None
    with open(p) as fh:
        name = fh.read().strip()
    if not name:
        raise ValueError(f"empty {POINTER} pointer at {p}")
    return name


def _write_pointer(root: str, name: str) -> None:
    """Atomically repoint `_CURRENT` to `name` (temp + os.replace —
    readers see either the old or the new pointer, never a torn
    write). The LAST step of every generation switch."""
    tmp = os.path.join(root, POINTER + ".tmp")
    with open(tmp, "w") as fh:
        fh.write(name + "\n")
    os.replace(tmp, os.path.join(root, POINTER))


def _unrooted_content(root: str) -> list[str]:
    """Top-level entries that mark `root` as a LIVE un-rooted state
    dir (anything that is not the pointer, a generation dir, or a
    hidden bookkeeping file). Named state tables (digests/signatures/
    bands), bare part-*.parquet files (HLL register state is written
    exactly like that), layout manifests, and _SUCCESS markers all
    count: pointing `_CURRENT` past ANY of them shadows live state."""
    offenders = []
    for entry in sorted(os.listdir(root)):
        if entry in (POINTER, POINTER + ".tmp"):
            continue
        if entry.startswith("."):       # .crc and other hidden files
            continue
        if _GEN_RE.match(entry):        # generation dirs (incl. any
            continue                    # crashed-compact leftovers)
        offenders.append(entry)
    return offenders


def init_state_root(root: str) -> str:
    """Create a pointered state root with an empty first generation
    and return the active generation dir. Idempotent: an existing
    pointer is honored, not clobbered (re-initializing a live root
    must never orphan its state).

    Refuses a directory that already holds ANY un-rooted content —
    named state tables (digests/signatures/bands), bare
    part-*.parquet data files (HLL register state lives like that),
    layout manifests, _SUCCESS markers: pointing `_CURRENT` at a
    fresh empty generation would shadow the live content sitting in
    the root itself, and the stream's next batch — resolving the
    pointer — would silently re-admit duplicates / undercount
    registers. Migrate by moving the content into
    `<root>/gen-000001/` first, then init."""
    os.makedirs(root, exist_ok=True)
    cur = current_generation(root)
    if cur is None:
        live = _unrooted_content(root)
        if live:
            shown = ", ".join(live[:5])
            if len(live) > 5:
                shown += f", ... ({len(live)} entries)"
            raise ValueError(
                f"{root} already holds un-rooted state content "
                f"({shown}) — initializing a pointer here would "
                "shadow it with an empty generation and re-admit "
                "every previously-seen duplicate (or silently "
                "undercount sketch registers); move it into "
                f"{os.path.join(root, generation_name(1))}/ first")
        cur = generation_name(1)
        os.makedirs(os.path.join(root, cur), exist_ok=True)
        _write_pointer(root, cur)
    return os.path.join(root, cur)


def next_generation(root: str) -> str:
    """Name of the generation AFTER the highest one present on disk
    (not merely after `_CURRENT`: an earlier compact that crashed
    before its pointer flip leaves an unreferenced gen dir, and
    reusing its number would mix two compacts' outputs)."""
    highest = 0
    for entry in os.listdir(root):
        m = _GEN_RE.match(entry)
        if m:
            highest = max(highest, int(m.group(1)))
    if highest == 0:
        raise ValueError(
            f"{root} has no gen-NNNNNN directories — not a pointered "
            "state root (init_state_root first, or compact the plain "
            "dir with the two-dir API)")
    return generation_name(highest + 1)


def switch_generation(root: str, name: str) -> None:
    """Flip `_CURRENT` to `name` after verifying the generation dir
    exists — pointing at a missing dir is exactly the typo'd-switch
    accident this protocol exists to prevent."""
    if not os.path.isdir(os.path.join(root, name)):
        raise ValueError(
            f"generation dir {name!r} does not exist under {root} — "
            "refusing to point _CURRENT at missing state")
    _write_pointer(root, name)
