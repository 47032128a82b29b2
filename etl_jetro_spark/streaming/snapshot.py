"""Poll-snapshot watcher: the reference's settle/timeout semantics, exact.

``retrieve_pdf`` (reference sheet_bot/utils.py:77-406) polls watch folders,
debounces each candidate on a size-stability window, moves settled files,
and errors POs that never complete within the deadline. Directory listings
are control-plane small (hundreds of names), so the state machine is a
deterministic pure-Python step function over successive snapshots —
trivially testable, restartable, and drivable from any scheduler (a cron, a
foreachBatch, or the reference's 60 s loop). The data-plane (what's *in*
the PDFs) never touches this path.

State transitions per PO (T2/T4/T5):
    (unseen) --sighting--> waiting --same size next poll--> done
    (any non-done) --deadline exceeded--> error
Pre-check: a file already in the destination counts as done immediately.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field

from etl_jetro_spark.streaming.watcher import move_file_idempotent

PO_FROM_NAME = re.compile(r"-(\d+)\.pdf$", re.IGNORECASE)


def po_of(name: str) -> str | None:
    m = PO_FROM_NAME.search(name)
    return m.group(1) if m else None


@dataclass
class Sighting:
    path: str
    size: int
    polls_stable: int = 0


@dataclass
class WatchState:
    expected: set[str]
    deadline_polls: int
    sightings: dict[str, Sighting] = field(default_factory=dict)  # po -> file
    status: dict[str, str] = field(default_factory=dict)          # po -> waiting|done|error
    moved_to: dict[str, str] = field(default_factory=dict)
    polls: int = 0

    def pending(self) -> set[str]:
        return {
            po for po in self.expected if self.status.get(po) not in ("done", "error")
        }


def new_watch(expected: list[str], deadline_polls: int = 600) -> WatchState:
    return WatchState(expected=set(expected), deadline_polls=deadline_polls)


def precheck_dest(state: WatchState, dest_dir: str) -> WatchState:
    """T5: already-delivered POs are done before the first poll."""
    if os.path.isdir(dest_dir):
        for name in os.listdir(dest_dir):
            po = po_of(name)
            if po in state.expected:
                state.status[po] = "done"
                state.moved_to[po] = os.path.join(dest_dir, name)
    return state


def poll_step(
    state: WatchState,
    listing: list[tuple[str, int]],
    dest_dir: str,
    move: bool = True,
) -> list[tuple[str, str]]:
    """One poll tick over a (path, size) listing. Mutates ``state`` and
    returns this tick's transitions [(po, new_status)]."""
    state.polls += 1
    transitions: list[tuple[str, str]] = []
    by_po: dict[str, tuple[str, int]] = {}
    for path, size in listing:
        po = po_of(os.path.basename(path))
        if po in state.expected and state.status.get(po) != "done":
            by_po.setdefault(po, (path, size))  # first match wins (D1)

    for po, (path, size) in by_po.items():
        s = state.sightings.get(po)
        if s is None or s.path != path or s.size != size:
            state.sightings[po] = Sighting(path, size, polls_stable=0)
            if state.status.get(po) != "waiting":
                state.status[po] = "waiting"
                transitions.append((po, "waiting"))
        else:
            s.polls_stable += 1
            # settle: unchanged across one full poll interval
            dest = (
                move_file_idempotent(path, dest_dir) if move
                else os.path.join(dest_dir, os.path.basename(path))
            )
            if dest is not None:
                state.status[po] = "done"
                state.moved_to[po] = dest
                transitions.append((po, "done"))

    if state.polls >= state.deadline_polls:
        for po in sorted(state.pending()):
            state.status[po] = "error"
            transitions.append((po, "error"))
    return transitions


def list_dir(folder: str) -> list[tuple[str, int]]:
    out = []
    if os.path.isdir(folder):
        for name in os.listdir(folder):
            p = os.path.join(folder, name)
            if os.path.isfile(p):
                out.append((p, os.path.getsize(p)))
    return sorted(out)
