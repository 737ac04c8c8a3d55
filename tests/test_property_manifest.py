"""Property test for the multi-writer CAS manifest (VERDICT r3 next-step #3):
random interleavings of add/delete/fold across TWO Manifest handles on one
root must lose nothing — the surviving SST set equals the sequential model
(every add survives unless a later op deleted it).

Deletes here follow the engine's real shape: a writer only deletes file ids
it has OBSERVED (compaction deletes its scanned inputs), so causality is
respected — exactly the guarantee the conditional-put log provides.
"""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from horaedb_spark.core.timeutil import TimeRange
from horaedb_spark.storage.backend import ObjectStoreBackend, PosixBackend
from horaedb_spark.storage.manifest import Manifest, SstFile


def _sst(fid: int) -> SstFile:
    return SstFile(
        file_id=fid,
        path=f"/fake/{fid}",
        time_range=TimeRange(0, 100),
        max_sequence=fid,
        num_rows=1,
        size_bytes=1,
    )


# an op is (writer_index, kind) where kind is:
#   "add"     — add the next fresh file id
#   "compact" — replace up to 3 of the writer's OBSERVED live ids with a
#               fresh one (add new + delete inputs in ONE delta, like the
#               compaction executor)
#   "fold"    — force a snapshot merge
#   "refresh" — re-read the log (a writer syncing its view)
_OPS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=1),
        st.sampled_from(["add", "add", "add", "compact", "fold", "refresh"]),
    ),
    min_size=1,
    max_size=40,
)


@pytest.mark.parametrize("backend_cls", [PosixBackend, ObjectStoreBackend],
                         ids=lambda c: c.name)
@given(ops=_OPS)
@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_interleaved_writers_match_set_model(tmp_path_factory, backend_cls, ops):
    root = str(tmp_path_factory.mktemp("pm"))
    writers = [
        Manifest(root, merge_soft_threshold=4, merge_hard_threshold=1000,
                 backend=backend_cls()),
        Manifest(root, merge_soft_threshold=4, merge_hard_threshold=1000,
                 backend=backend_cls()),
    ]
    next_fid = [0]
    live_model: set[int] = set()

    def fresh() -> int:
        next_fid[0] += 1
        return next_fid[0]

    for widx, kind in ops:
        m = writers[widx]
        if kind == "add":
            fid = fresh()
            m.update([_sst(fid)], [])
            live_model.add(fid)
        elif kind == "compact":
            observed = sorted(s.file_id for s in m.all_ssts())[:3]
            # only compact ids still live in the MODEL too (another writer's
            # compaction may have raced ours — the engine's CAS mark handles
            # that; here we emulate by checking the model)
            inputs = [fid for fid in observed if fid in live_model]
            if not inputs:
                continue
            out = fresh()
            m.update([_sst(out)], inputs)
            live_model.difference_update(inputs)
            live_model.add(out)
        elif kind == "fold":
            m.merge_snapshot()
        else:
            m._refresh()

    final = Manifest(root, backend=backend_cls())
    assert {s.file_id for s in final.all_ssts()} == live_model


def test_stale_writer_delta_name_reuse_is_retracted(tmp_path, monkeypatch):
    """The pathological interleaving the retention window used to merely
    make unlikely: a stale writer lands its delta at a name that a
    concurrent fold already folded AND garbage-collected. Publish-time
    validation must retract the invisible delta and retry above the fold
    point — no silent lost update (SCALING.md round-6 closure)."""
    from horaedb_spark.storage.backend import PosixBackend
    from horaedb_spark.storage.manifest import Manifest

    root = str(tmp_path / "reuse")
    monkeypatch.setattr(Manifest, "DELTA_RETAIN", 0)

    victim_state = {"fired": False}

    class RacingBackend(PosixBackend):
        """Fires a competing burst of appends + fold right between the
        victim's pre-CAS sync and its conditional PUT."""

        def put_if_absent(self, path, data):
            if "delta-" in path and not victim_state["fired"]:
                victim_state["fired"] = True
                other = Manifest(
                    root, merge_soft_threshold=10_000,
                    merge_hard_threshold=10_000, background_fold=False,
                )
                for i in range(15):
                    other.update([_sst(100 + i)], [])
                other.merge_snapshot()  # folds + GCs every delta name
            return super().put_if_absent(path, data)

    victim = Manifest(
        root, merge_soft_threshold=10_000, merge_hard_threshold=10_000,
        backend=RacingBackend(), background_fold=False,
    )
    victim.update([_sst(1)], [])
    assert victim_state["fired"]
    final = Manifest(root, background_fold=False)
    got = {s.file_id for s in final.all_ssts()}
    assert 1 in got, got  # the victim's SST survived the name-reuse race
    assert got == {1} | {100 + i for i in range(15)}
