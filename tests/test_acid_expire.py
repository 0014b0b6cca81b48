"""expire_snapshots (engine/acid.py): history truncation + vacuum. Kept
snapshots must reconstruct exactly; expired reads must raise; data files no
kept snapshot references must be GONE from disk; current reads unaffected."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from datavalidation_spark.engine.acid import ManifestLog


def _df(spark, lo, hi):
    return spark.range(lo, hi).withColumn("v", F.col("id") * 2)


def _ids(df):
    return sorted(r.id for r in df.collect())


def test_expire_truncates_history_and_vacuums(spark, tmp_path):
    log = ManifestLog(str(tmp_path / "m"))
    s1 = log.commit({"t": _df(spark, 0, 5)})
    s2 = log.commit({"t": _df(spark, 100, 103)}, replace=True)  # hides s1
    s3 = log.commit({"t": _df(spark, 200, 202)})
    s4 = log.commit({"t": _df(spark, 300, 301)})
    s1_files = set(log.committed_files_at("t", s1))
    assert s1_files, "s1 must reference data files before expiry"

    res = log.expire_snapshots(before_seq=s3)
    # s1 unreachable; s2 collapses into the synthetic base
    assert res["expired_snapshots"] == 1
    assert res["deleted_files"] >= 1

    # current read unaffected
    assert _ids(log.read(spark, "t")) == [100, 101, 102, 200, 201, 300]
    # kept snapshots reconstruct exactly
    assert _ids(log.read_at(spark, "t", s2)) == [100, 101, 102]
    assert _ids(log.read_at(spark, "t", s3)) == [100, 101, 102, 200, 201]
    assert _ids(log.read_at(spark, "t", s4)) == [100, 101, 102, 200, 201, 300]
    # expired snapshot raises (below the history floor)
    with pytest.raises(ValueError):
        log.committed_files_at("t", s1)
    # vacuum: s1's files (replaced at s2, unreferenced by any kept state)
    # are physically gone
    assert all(not os.path.exists(f) for f in s1_files)


def test_expire_keeps_files_shared_with_kept_snapshots(spark, tmp_path):
    log = ManifestLog(str(tmp_path / "m"))
    s1 = log.commit({"t": _df(spark, 0, 5)})       # appended, never replaced
    s2 = log.commit({"t": _df(spark, 10, 12)})
    s3 = log.commit({"t": _df(spark, 20, 21)})
    res = log.expire_snapshots(before_seq=s3)
    # s1/s2 files are still part of every kept state (append-only table):
    # nothing may be deleted
    assert res["deleted_files"] == 0
    assert _ids(log.read(spark, "t")) == [0, 1, 2, 3, 4, 10, 11, 20]
    assert _ids(log.read_at(spark, "t", s2)) == [0, 1, 2, 3, 4, 10, 11]
    with pytest.raises(ValueError):
        log.committed_files_at("t", s1)


def test_expire_noop_cases(spark, tmp_path):
    log = ManifestLog(str(tmp_path / "m"))
    assert log.expire_snapshots(10) == {
        "expired_snapshots": 0, "deleted_files": 0,
    }
    s1 = log.commit({"t": _df(spark, 0, 3)})
    assert log.expire_snapshots(before_seq=s1) == {
        "expired_snapshots": 0, "deleted_files": 0,
    }
    assert _ids(log.read(spark, "t")) == [0, 1, 2]


def test_commit_and_compact_after_expire(spark, tmp_path):
    log = ManifestLog(str(tmp_path / "m"))
    log.commit({"t": _df(spark, 0, 3)})
    s2 = log.commit({"t": _df(spark, 10, 12)}, replace=True)
    s3 = log.commit({"t": _df(spark, 20, 21)})
    log.expire_snapshots(before_seq=s3)
    s4 = log.commit({"t": _df(spark, 30, 31)})
    log.compact()
    assert _ids(log.read(spark, "t")) == [10, 11, 20, 30]
    assert _ids(log.read_at(spark, "t", s2)) == [10, 11]
    assert _ids(log.read_at(spark, "t", s4)) == [10, 11, 20, 30]


def test_expire_does_not_swallow_concurrent_commit(spark, tmp_path, monkeypatch):
    """ADVICE r4 (medium): a committer racing expire_snapshots at the same
    _next_seq() must keep its commit visible. The old code linked only the
    '_checkpoint-{seq}.json' alias, so a commit landing at '{seq}.json'
    (different filename — no collision) ended up AT the checkpoint floor:
    invisible to reads and dropped un-folded by the next compact. The fix
    claims '{seq}.json' first through the optimistic retry loop.

    Interleaving is forced deterministically: the 'concurrent' committer
    runs inside expire's _next_seq() call and takes exactly the seq expire
    is about to use."""
    log = ManifestLog(str(tmp_path / "m"))
    log.commit({"t": _df(spark, 0, 3)})
    s2 = log.commit({"t": _df(spark, 10, 12)})
    s3 = log.commit({"t": _df(spark, 20, 21)})

    racer_df = _df(spark, 900, 903).localCheckpoint(eager=True)
    orig_next_seq = ManifestLog._next_seq
    fired = {"done": False}

    def race_next_seq(self):
        seq = orig_next_seq(self)
        if not fired["done"]:
            fired["done"] = True
            racer = ManifestLog(self.root)
            won = racer.commit({"t": racer_df})
            assert won == seq, "racer must land exactly on expire's seq"
        return seq

    monkeypatch.setattr(ManifestLog, "_next_seq", race_next_seq)
    log.expire_snapshots(before_seq=s3)
    monkeypatch.undo()

    # the racer's rows must be visible now...
    assert _ids(log.read(spark, "t")) == [0, 1, 2, 10, 11, 20, 900, 901, 902]
    # ...and still visible after compaction (the old bug deleted the commit
    # file without folding it)
    log.compact()
    assert _ids(log.read(spark, "t")) == [0, 1, 2, 10, 11, 20, 900, 901, 902]
    assert _ids(log.read_at(spark, "t", s2)) == [0, 1, 2, 10, 11]


def test_expire_crash_between_claim_and_alias_is_recoverable(
    spark, tmp_path, monkeypatch
):
    """Crash window of the claim-first protocol: '{seq}.json' linked, the
    '_checkpoint-' alias not yet. The claim is a NO-OP slot reservation
    (round 5: a full-state replace-all payload in this window could erase a
    concurrent commit that landed in the gap), so a crash here means the
    expiry simply DID NOT HAPPEN: current reads and every snapshot stay
    intact, the orphaned claim is a phantom-free no-op, and a retry
    completes the expiry."""
    import os as _os

    log = ManifestLog(str(tmp_path / "m"))
    s1 = log.commit({"t": _df(spark, 0, 3)})
    s2 = log.commit({"t": _df(spark, 10, 12)}, replace=True)
    s3 = log.commit({"t": _df(spark, 20, 21)})

    real_link = _os.link
    state = {"claims": 0}

    def crashing_link(src, dst):
        if "_checkpoint-" in _os.path.basename(dst) and state["claims"] == 1:
            raise OSError("simulated crash before checkpoint alias")
        if _os.path.basename(dst)[0].isdigit():
            state["claims"] += 1
        return real_link(src, dst)

    monkeypatch.setattr("datavalidation_spark.engine.acid.os.link", crashing_link)
    with pytest.raises(OSError, match="simulated crash"):
        log.expire_snapshots(before_seq=s3)
    monkeypatch.undo()

    # the expiry never happened: current reads exact, ALL snapshots intact
    assert _ids(log.read(spark, "t")) == [10, 11, 20]
    assert _ids(log.read_at(spark, "t", s3)) == [10, 11, 20]
    assert _ids(log.read_at(spark, "t", s2)) == [10, 11]
    assert _ids(log.read_at(spark, "t", s1)) == [0, 1, 2]
    # the orphaned no-op claim is not a snapshot and compact folds it away
    assert [s for s, m in log.snapshots() if m.get("expire_claim")] == []
    log.compact()
    assert _ids(log.read(spark, "t")) == [10, 11, 20]
    assert _ids(log.read_at(spark, "t", s1)) == [0, 1, 2]
    # retry completes the expiry: pre-boundary snapshots now gone
    log.expire_snapshots(before_seq=s3)
    assert _ids(log.read(spark, "t")) == [10, 11, 20]
    with pytest.raises(ValueError):
        log.committed_files_at("t", s1)


def test_expire_preserves_cdc_batch_ids(spark, tmp_path):
    """ADVICE r4: expiry must not forget applied CDC batch ids — a stale
    foreachBatch replay after expire would otherwise be re-applied."""
    from datavalidation_spark.streaming.upsert_stream import (
        apply_cdc_batch,
        applied_batches,
    )

    log = ManifestLog(str(tmp_path / "m"))
    for b in range(3):
        ch = spark.createDataFrame(
            [(b * 10 + i, float(b)) for i in range(2)], "id bigint, v double"
        )
        assert apply_cdc_batch(log, "t", ch, batch_id=b, key_cols=["id"])
    head = log.snapshots()[-1][0]
    log.expire_snapshots(before_seq=head)  # expire all but the newest
    assert applied_batches(log, "t") == {0, 1, 2}
    # second expiry folds the cdc_applied union forward, not just live meta
    log.commit({"t": _df(spark, 500, 501)})
    log.expire_snapshots(before_seq=log.snapshots()[-1][0])
    assert applied_batches(log, "t") == {0, 1, 2}
    # replay of an expired batch id is still a no-op
    ch = spark.createDataFrame([(999, 9.9)], "id bigint, v double")
    assert apply_cdc_batch(log, "t", ch, batch_id=1, key_cols=["id"]) is False


def test_expire_gap_crash_leaves_claim_harmless(spark, tmp_path, monkeypatch):
    """Round-5 hardening: a concurrent commit lands in (top, claim_seq) and
    expire crashes AFTER linking its claim but BEFORE the gap-branch
    release-unlink. The claim is a no-op slot reservation, so the orphan
    can never erase the gap commit's data (the pre-fix full-state claim
    was a replace-all computed WITHOUT the gap commit — readers and the
    next compact would have dropped those rows forever)."""
    import os as _os

    log = ManifestLog(str(tmp_path / "m"))
    log.commit({"t": _df(spark, 0, 3)})
    s2 = log.commit({"t": _df(spark, 10, 12)})
    s3 = log.commit({"t": _df(spark, 20, 21)})

    racer_df = _df(spark, 900, 903).localCheckpoint(eager=True)
    orig_next_seq = ManifestLog._next_seq
    fired = {"done": False}

    def race_next_seq(self):
        seq = orig_next_seq(self)
        if not fired["done"]:
            fired["done"] = True
            racer = ManifestLog(self.root)
            won = racer.commit({"t": racer_df})
            assert won == seq
        return seq

    real_unlink = _os.unlink

    def crashing_unlink(path):
        # the gap-branch claim release is the first digit-named unlink
        # after the racer fired
        if fired["done"] and _os.path.basename(path)[0].isdigit():
            raise OSError("simulated crash before claim release")
        return real_unlink(path)

    monkeypatch.setattr(ManifestLog, "_next_seq", race_next_seq)
    monkeypatch.setattr(
        "datavalidation_spark.engine.acid.os.unlink", crashing_unlink
    )
    with pytest.raises(OSError, match="simulated crash"):
        log.expire_snapshots(before_seq=s3)
    monkeypatch.undo()

    # the gap commit's rows are intact, now and through compaction; the
    # orphaned claim is not a snapshot
    want = [0, 1, 2, 10, 11, 20, 900, 901, 902]
    assert _ids(log.read(spark, "t")) == want
    assert [s for s, m in log.snapshots() if m.get("expire_claim")] == []
    log.compact()
    assert _ids(log.read(spark, "t")) == want
    assert _ids(log.read_at(spark, "t", s2)) == [0, 1, 2, 10, 11]
