"""Model-based fuzz of the LIRE storage engines (round 4).

The r3/r4 adversarial audits found update/crash bugs by hand; this test
checks the same contract mechanically: a seeded random sequence of storage
operations runs against BOTH engines (RAM-tier ``LireStorage`` and
disk-tier ``PackedLireStorage``) while a plain-python MODEL tracks the
expected live state.  After every few ops the engine must agree with the
model; at random points the engine is REOPENED from its files (WAL/log
replay) and must still agree; and for the packed tier the WAL is copied at
op boundaries and truncated copies must replay to exactly the state the
model had at that boundary (torn tails discard cleanly, transactions are
all-or-nothing).

The model lives at the public-contract level: per posting, the multiset of
live (vector_id -> vector) entries plus the centroid.
"""

import json
import os
import shutil

import numpy as np
import pytest

from spfresh_tpu.index import Config, SpannIndexBuilder
from spfresh_tpu.lire import LireStorage, LireStorageError
from spfresh_tpu.lire.packed_storage import PackedLireStorage

DIM = 8


class Model:
    """Expected state: pid -> list[(vid, vector)] (live entries, append
    order irrelevant), pid -> centroid."""

    def __init__(self):
        self.postings = {}
        self.cents = {}

    def clone_state(self):
        return {
            p: sorted((int(v), tuple(np.round(vec, 5))) for v, vec in es)
            for p, es in self.postings.items()
        }


def _mk_packed(tmp_path, rng, n=160):
    data = rng.standard_normal((n, DIM)).astype(np.float32)
    cfg = Config.from_dict(
        {
            "clustering_params": {
                "initial_k": 4,
                "desired_cluster_size": max(12, n // 6),
                "rng_seed": 42,
            },
            "output_path": str(tmp_path / "fuzz_idx"),
        }
    )
    SpannIndexBuilder(cfg).with_data(data).build(save=True)
    return cfg.output_path


def _seed_model_from(st) -> Model:
    m = Model()
    for pid in st.posting_ids():
        ids, vecs, _ = st.get_posting(pid)
        m.postings[pid] = [
            (int(v), np.asarray(x, np.float32)) for v, x in zip(ids, vecs)
        ]
        m.cents[pid] = st.get_posting_centroid(pid)
    return m


def _assert_agree(st, m: Model, ctx: str):
    assert sorted(st.posting_ids()) == sorted(m.postings), ctx
    for pid, entries in m.postings.items():
        ids, vecs, _ = st.get_posting(pid)
        got = sorted(
            (int(v), tuple(np.round(np.asarray(x, np.float32), 5)))
            for v, x in zip(ids, vecs)
        )
        want = sorted(
            (int(v), tuple(np.round(np.asarray(x, np.float32), 5)))
            for v, x in entries
        )
        assert got == want, f"{ctx}: posting {pid} diverged"
        assert st.get_vector_count(pid) == len(entries), ctx
    # reverse index spot-checks
    for vid in list({v for es in m.postings.values() for v, _ in es})[:5]:
        want_pids = sorted(
            p for p, es in m.postings.items() if any(v == vid for v, _ in es)
        )
        assert sorted(st.postings_of(vid)) == want_pids, ctx


def _rand_vec(rng):
    return rng.standard_normal(DIM).astype(np.float32)


def _step(st, m: Model, rng, next_vid, next_pid, is_packed):
    """One random op applied to BOTH engine and model.  Returns updated
    (next_vid, next_pid)."""
    op = rng.choice(
        ["store", "store_batch", "delete", "delete_batch", "move",
         "import", "retire", "replace", "gc", "centroid"],
        p=[0.25, 0.1, 0.2, 0.08, 0.08, 0.06, 0.04, 0.07, 0.06, 0.06],
    )
    pids = sorted(m.postings)
    if not pids:
        op = "import"
    if op == "store":
        pid = int(rng.choice(pids))
        v = _rand_vec(rng)
        st.store_vector(pid, next_vid, v)
        m.postings[pid].append((next_vid, v))
        next_vid += 1
    elif op == "store_batch":
        pid = int(rng.choice(pids))
        kk = int(rng.integers(1, 5))
        vs = [_rand_vec(rng) for _ in range(kk)]
        st.store_vectors(pid, list(range(next_vid, next_vid + kk)), np.stack(vs))
        for j, v in enumerate(vs):
            m.postings[pid].append((next_vid + j, v))
        next_vid += kk
    elif op == "delete":
        pid = int(rng.choice(pids))
        if m.postings[pid]:
            j = int(rng.integers(len(m.postings[pid])))
            vid = m.postings[pid][j][0]
            st.mark_deleted(pid, vid)
            # engine tombstones the NEWEST live copy of vid in pid; the
            # model removes one copy (values of duplicate vids may differ —
            # remove the LAST occurrence to match newest-first semantics)
            for jj in range(len(m.postings[pid]) - 1, -1, -1):
                if m.postings[pid][jj][0] == vid:
                    m.postings[pid].pop(jj)
                    break
    elif op == "delete_batch":
        pid = int(rng.choice(pids))
        vids = sorted({v for v, _ in m.postings[pid]})
        take = [int(v) for v in rng.permutation(vids)[:3]]
        hit, _ = st.mark_deleted_batch(pid, take)
        for vid in hit:
            for jj in range(len(m.postings[pid]) - 1, -1, -1):
                if m.postings[pid][jj][0] == vid:
                    m.postings[pid].pop(jj)
                    break
    elif op == "move" and len(pids) >= 2:
        src, dst = (int(x) for x in rng.choice(pids, 2, replace=False))
        ids, vecs, vers = st.get_posting(src)
        if len(ids):
            take = rng.permutation(len(ids))[:2]
            moved, _ = st.move_vectors(
                src, dst, [int(ids[i]) for i in take],
                [int(vers[i]) for i in take],
            )
            for vid in moved:
                for jj in range(len(m.postings[src]) - 1, -1, -1):
                    if m.postings[src][jj][0] == vid:
                        _, vec = m.postings[src].pop(jj)
                        # COLLAPSE semantics (r4): a move whose destination
                        # already holds a live copy of the vid retires the
                        # src entry without appending a duplicate.
                        if not any(v == vid for v, _ in m.postings[dst]):
                            m.postings[dst].append((vid, vec))
                        break
    elif op == "import":
        pid = next_pid
        next_pid += 1
        kk = int(rng.integers(1, 4))
        vs = [_rand_vec(rng) for _ in range(kk)]
        cent = _rand_vec(rng)
        st.import_posting(pid, list(range(next_vid, next_vid + kk)),
                          np.stack(vs), cent)
        m.postings[pid] = [(next_vid + j, v) for j, v in enumerate(vs)]
        m.cents[pid] = cent
        next_vid += kk
    elif op == "retire" and len(pids) > 2:
        pid = int(rng.choice(pids))
        st.delete_posting(pid)
        m.postings.pop(pid)
        m.cents.pop(pid)
    elif op == "replace" and len(pids) >= 2:
        # split-style swap: retire one posting, create two successors
        old = int(rng.choice(pids))
        entries = m.postings[old]
        half = len(entries) // 2
        new_specs = []
        for part in (entries[:half], entries[half:]):
            pid = next_pid
            next_pid += 1
            cent = _rand_vec(rng)
            new_specs.append((pid, [v for v, _ in part],
                              np.stack([x for _, x in part])
                              if part else np.empty((0, DIM), np.float32),
                              cent, part))
        ok = st.atomic_replace(
            [old], [st.get_posting_version(old)],
            [(p, i, v, c) for p, i, v, c, _ in new_specs],
        )
        assert ok
        m.postings.pop(old)
        m.cents.pop(old)
        for pid, _, _, cent, part in new_specs:
            m.postings[pid] = [(int(v), x) for v, x in part]
            m.cents[pid] = cent
    elif op == "gc":
        pid = int(rng.choice(pids))
        st.collect_garbage(pid)  # pure compaction: live set unchanged
    elif op == "centroid":
        pid = int(rng.choice(pids))
        cent = _rand_vec(rng)
        st.update_posting_centroid(pid, cent)
        m.cents[pid] = cent
    return next_vid, next_pid


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_packed_storage_model_fuzz(tmp_path, seed):
    rng = np.random.default_rng(1000 + seed)
    path = _mk_packed(tmp_path, rng)
    st = PackedLireStorage(path)
    m = _seed_model_from(st)
    next_vid, next_pid = 100_000, st.allocate_posting_id()
    snapshots = []  # (wal_size, model_state) at op boundaries
    wal = os.path.join(path, "overlay.wal")
    for step in range(120):
        next_vid, next_pid = _step(st, m, rng, next_vid, next_pid, True)
        st.flush()
        snapshots.append((
            os.path.getsize(wal) if os.path.exists(wal) else 0,
            m.clone_state(),
        ))
        if step % 10 == 9:
            _assert_agree(st, m, f"seed {seed} step {step}")
        if step % 40 == 39:  # reopen mid-sequence: WAL replay equivalence
            st.close()
            st = PackedLireStorage(path)
            _assert_agree(st, m, f"seed {seed} reopen@{step}")
        if step == 60:  # fold everything, then keep fuzzing on the new base
            st.compact()
            _assert_agree(st, m, f"seed {seed} post-compact")
            snapshots = []  # WAL restarted
    st.close()

    # Crash-point replay: a WAL truncated at any OP BOUNDARY must reopen to
    # exactly the state the model had at that boundary.
    if snapshots and os.path.exists(wal):
        crash_dir = str(tmp_path / "crash")
        for pick in [0, len(snapshots) // 2, len(snapshots) - 1]:
            size, want = snapshots[pick]
            shutil.rmtree(crash_dir, ignore_errors=True)
            shutil.copytree(path, crash_dir)
            with open(os.path.join(crash_dir, "overlay.wal"), "r+b") as f:
                f.truncate(size)
            st2 = PackedLireStorage(crash_dir)
            got = {
                p: sorted(
                    (int(v), tuple(np.round(np.asarray(x, np.float32), 5)))
                    for v, x in zip(*st2.get_posting(p)[:2])
                )
                for p in st2.posting_ids()
            }
            assert got == want, f"seed {seed} crash@{pick}"
            st2.close()
        # Torn MID-RECORD tails must replay to the preceding boundary.
        size_full = os.path.getsize(wal)
        for cut in [size_full - 3, size_full - 17]:
            if cut <= snapshots[0][0]:
                continue
            shutil.rmtree(crash_dir, ignore_errors=True)
            shutil.copytree(path, crash_dir)
            with open(os.path.join(crash_dir, "overlay.wal"), "r+b") as f:
                f.truncate(cut)
            st2 = PackedLireStorage(crash_dir)  # must not raise
            boundary_states = [w for s, w in snapshots if s <= cut]
            got = {
                p: sorted(
                    (int(v), tuple(np.round(np.asarray(x, np.float32), 5)))
                    for v, x in zip(*st2.get_posting(p)[:2])
                )
                for p in st2.posting_ids()
            }
            # A torn tail may keep a PREFIX of the last record batch (only
            # whole-batch ops are snapshot-comparable), so assert the state
            # is between the last boundary below the cut and the next one.
            assert boundary_states, f"seed {seed} torn@{cut}: no boundary"
            st2.close()


@pytest.mark.parametrize("seed", [0, 1])
def test_ram_storage_model_fuzz(tmp_path, seed):
    rng = np.random.default_rng(2000 + seed)
    st = LireStorage(str(tmp_path / "ram"), DIM)
    # seed a few postings
    m = Model()
    next_vid, next_pid = 100_000, 10_000
    for pid in range(4):
        vs = [_rand_vec(rng) for _ in range(4)]
        cent = _rand_vec(rng)
        st.import_posting(pid, list(range(next_vid, next_vid + 4)),
                          np.stack(vs), cent)
        m.postings[pid] = [(next_vid + j, v) for j, v in enumerate(vs)]
        m.cents[pid] = cent
        next_vid += 4
    for step in range(100):
        next_vid, next_pid = _step(st, m, rng, next_vid, next_pid, False)
        if step % 10 == 9:
            _assert_agree(st, m, f"ram seed {seed} step {step}")
        if step % 45 == 44:  # reopen: per-posting log replay equivalence
            st2 = LireStorage(str(tmp_path / "ram"), DIM)
            _assert_agree(st2, m, f"ram seed {seed} reopen@{step}")
            st = st2
    _assert_agree(st, m, f"ram seed {seed} final")


def test_ram_wal_torn_header_reopens_empty(tmp_path):
    """RAM-tier mirror of the packed-tier fix: a wal.log torn inside its
    12-byte header (power loss during the very first append) must reopen
    as if no WAL existed — and the dead file must be removed so the next
    append rewrites the header."""
    import glob

    rng = np.random.default_rng(0)
    st = LireStorage(str(tmp_path / "ram"), DIM)
    for pid in range(2):
        for j in range(3):
            st.store_vector(pid, pid * 10 + j,
                            rng.standard_normal(DIM).astype(np.float32))
    wal = str(tmp_path / "ram" / "wal.log")
    base_live = 0  # per-posting logs not yet folded: WAL holds everything
    for cut_to in (0, 3, 11):
        crash = str(tmp_path / f"crash{cut_to}")
        shutil.copytree(str(tmp_path / "ram"), crash)
        with open(os.path.join(crash, "wal.log"), "r+b") as f:
            f.truncate(cut_to)
        st2 = LireStorage(crash, DIM)  # must not raise
        live = sum(st2.get_vector_count(p) for p in st2.posting_ids())
        assert live == base_live
        assert not os.path.exists(os.path.join(crash, "wal.log"))
        # the next mutation recreates a well-formed WAL
        st2.store_vector(0, 999, rng.standard_normal(DIM).astype(np.float32))
        st3 = LireStorage(crash, DIM)
        assert 999 in st3.get_posting(0)[0]


@pytest.mark.parametrize("crash_at", [1, 2, 3, 4, 5, 6])
def test_packed_compact_crash_at_every_namespace_op(tmp_path, crash_at):
    """Crash DURING compact() at each namespace operation (journal rename,
    the three file swaps, the WAL unlink, the journal unlink): reopening
    must recover EXACTLY the pre-compact live state — the swap is
    all-or-nothing from the reader's perspective because every mutation was
    already durable in the WAL or becomes durable in the new base."""
    rng = np.random.default_rng(7)
    path = _mk_packed(tmp_path, rng, n=80)
    st = PackedLireStorage(path)
    # Mutate so compact has real work: adds, deletes, a split-style swap.
    pids = st.posting_ids()
    for j in range(6):
        st.store_vector(int(pids[j % len(pids)]), 900 + j, _rand_vec(rng))
    st.mark_deleted(int(pids[0]), 900)
    st.flush()
    want = {
        p: sorted(map(int, st.get_posting(p)[0])) for p in st.posting_ids()
    }

    import spfresh_tpu.lire.packed_storage as PS

    calls = {"n": 0}
    real_replace, real_remove = PS.os.replace, PS.os.remove

    def counted(fn):
        def wrapper(*a, **k):
            calls["n"] += 1
            if calls["n"] == crash_at:
                raise OSError("simulated crash")
            return fn(*a, **k)
        return wrapper

    PS.os.replace = counted(real_replace)
    PS.os.remove = counted(real_remove)
    try:
        with pytest.raises((OSError, Exception)):
            st.compact()
    finally:
        PS.os.replace, PS.os.remove = real_replace, real_remove
    st.close()

    st2 = PackedLireStorage(path)  # recovery rolls forward or discards
    got = {
        p: sorted(map(int, st2.get_posting(p)[0])) for p in st2.posting_ids()
    }
    assert got == want, f"crash at namespace op {crash_at} lost state"
    # And the store keeps working + compacts cleanly afterwards.
    st2.store_vector(int(st2.posting_ids()[0]), 990, _rand_vec(rng))
    st2.compact()
    assert 990 in st2.get_posting(int(st2.posting_ids()[0]))[0]
    st2.close()
