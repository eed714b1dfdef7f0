"""Session snapshot/merge/diff tests (reference sessions_test.go semantics)."""

from __future__ import annotations

import pyspark.sql.functions as F


def _halves(tiny_routed):
    a = tiny_routed.where(F.col("turn_idx") < 5)
    b = tiny_routed.where(F.col("turn_idx") >= 5)
    return a, b


def test_merge_counts_exact(tiny_routed):
    """Merge(first half, second half) == full, counts exactly
    (reference sessions.go:459-466 additive union)."""
    from otlp_cardinality_checker_spark.operators.sessions import (
        estimate,
        merge_snapshots,
        snapshot_key_stats,
    )

    a, b = _halves(tiny_routed)
    merged = estimate(
        merge_snapshots(snapshot_key_stats(a), snapshot_key_stats(b))
    ).toPandas()
    full = estimate(snapshot_key_stats(tiny_routed)).toPandas()
    m = merged.merge(full, on=["sink", "key"], suffixes=("_m", "_f"))
    assert len(m) == len(full) == len(merged)
    assert (m["count_m"] == m["count_f"]).all()
    assert (m["value_samples_m"] == m["value_samples_f"]).all()


def test_merge_cardinality_accuracy(tiny_routed):
    """HLL union across snapshots stays within band of exact
    (mirrors reference TestMerge_CardinalityAccuracy sessions_test.go:767)."""
    from otlp_cardinality_checker_spark.operators.aggregate import key_stats
    from otlp_cardinality_checker_spark.operators.sessions import (
        estimate,
        merge_snapshots,
        snapshot_key_stats,
    )

    a, b = _halves(tiny_routed)
    merged = {
        (r["sink"], r["key"]): r["est_cardinality"]
        for r in estimate(
            merge_snapshots(snapshot_key_stats(a), snapshot_key_stats(b))
        ).collect()
    }
    exact = {
        (r["sink"], r["key"]): r["est_cardinality"]
        for r in key_stats(tiny_routed, exact=True).collect()
    }
    assert set(merged) == set(exact)
    for k, e in exact.items():
        assert abs(merged[k] - e) <= max(1, 0.1 * e)


def test_diff_classification(spark):
    from otlp_cardinality_checker_spark.operators.sessions import diff_key_stats

    schema = "sink string, key string, count long, est_cardinality long"
    a = spark.createDataFrame(
        [
            ("chat", "stable", 10, 5),
            ("chat", "grew2x", 10, 100),
            ("chat", "grew10x", 10, 100),
            ("chat", "gone", 3, 2),
        ],
        schema,
    )
    b = spark.createDataFrame(
        [
            ("chat", "stable", 10, 5),
            ("chat", "grew2x", 20, 250),
            ("chat", "grew10x", 20, 1000),
            ("chat", "newbig", 5, 2000),
            ("chat", "newsmall", 5, 3),
        ],
        schema,
    )
    got = {r["key"]: r for r in diff_key_stats(a, b).collect()}
    assert got["stable"]["change_type"] == "unchanged"
    assert got["gone"]["change_type"] == "removed"
    assert got["newbig"]["change_type"] == "added"
    assert got["newbig"]["severity"] == "warning"  # new key card >= 1000
    assert got["newsmall"]["severity"] == "info"
    assert got["grew2x"]["change_type"] == "changed"
    assert got["grew2x"]["severity"] == "warning"  # ratio >= 2x
    assert got["grew10x"]["severity"] == "critical"  # ratio >= 10x


def test_merge_is_associative_and_commutative(spark, tiny_routed):
    """Additive session merge must be order-insensitive: merge(a, merge(b, c))
    == merge(merge(a, b), c) == merge(c, a, b) on counts, samples, taint,
    and HLL estimates (sketch registers are max-merged, so unions agree
    regardless of grouping)."""
    import pyspark.sql.functions as F

    from otlp_cardinality_checker_spark.operators.sessions import (
        estimate,
        merge_snapshots,
        snapshot_key_stats,
    )

    a = snapshot_key_stats(tiny_routed.where(F.col("turn_idx") < 3))
    b = snapshot_key_stats(
        tiny_routed.where((F.col("turn_idx") >= 3) & (F.col("turn_idx") < 7))
    )
    c = snapshot_key_stats(tiny_routed.where(F.col("turn_idx") >= 7))

    def rows(snap):
        return sorted(
            tuple(r)
            for r in estimate(snap)
            .select("sink", "key", "count", "est_cardinality", "value_samples")
            .collect()
        )

    left = rows(merge_snapshots(a, merge_snapshots(b, c)))
    right = rows(merge_snapshots(merge_snapshots(a, b), c))
    flat = rows(merge_snapshots(c, a, b))
    assert left == right == flat


def test_fused_diff_equals_two_pass(tiny_routed):
    """diff_from_predicate (one parse pass, conditional aggregation) must be
    row-identical to diff_key_stats(key_stats(subset), key_stats(full)) —
    the two-pass reference form — including change/severity grading and
    NULL from-side columns for keys absent under the predicate."""
    from otlp_cardinality_checker_spark.operators.aggregate import key_stats
    from otlp_cardinality_checker_spark.operators.sessions import (
        diff_from_predicate,
        diff_key_stats,
    )

    pred = F.col("turn_idx") < 5
    two_pass = sorted(
        tuple(r)
        for r in diff_key_stats(
            key_stats(tiny_routed.where(pred), exact=True),
            key_stats(tiny_routed, exact=True),
        ).collect()
    )
    fused = sorted(
        tuple(r) for r in diff_from_predicate(tiny_routed, pred).collect()
    )
    assert fused == two_pass and len(fused) > 0


def test_fused_service_diff_equals_two_pass(tiny_routed):
    from otlp_cardinality_checker_spark.operators.sessions import (
        diff_service_stats,
        service_diff_from_predicate,
        service_grain_stats,
    )

    pred = F.col("turn_idx") < 5
    two_pass = sorted(
        tuple(r)
        for r in diff_service_stats(
            service_grain_stats(tiny_routed.where(pred)),
            service_grain_stats(tiny_routed),
        ).collect()
    )
    fused = sorted(
        tuple(r)
        for r in service_diff_from_predicate(tiny_routed, pred).collect()
    )
    assert fused == two_pass and len(fused) > 0


def test_cli_report_and_diff(tmp_path, spark):
    """The __main__ CLI maps the reference's workflows; drive report's
    exit-code gate and the save/diff path in-process."""
    from otlp_cardinality_checker_spark.__main__ import main

    out = main(
        [
            "--sf-dir", "/root/testdata/sf0.001", "--cores", "8",
            "report", "--exact", "--warn", "50", "--critical", "150",
            "--exit-on-threshold",
        ]
    )
    assert out == 1  # critical keys exist at these thresholds
    sess = str(tmp_path / "sess")
    assert main(
        ["--sf-dir", "/root/testdata/sf0.001", "--cores", "8",
         "save", "--out", sess]
    ) == 0
    assert main(["--cores", "8", "diff", sess, sess]) == 0


def test_cli_curate(tmp_path, spark):
    """curate subcommand: funnel + audit JSON on stdout, curated parquet
    out, deterministic across runs."""
    import json as _json

    from otlp_cardinality_checker_spark.__main__ import main

    out = tmp_path / "curated"
    import contextlib
    import io

    def run():
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            rc = main(
                ["--sf-dir", "/root/testdata/sf0.001", "--cores", "4",
                 "curate", "--rate", "en=0.5", "--out", str(out)]
            )
        assert rc == 0
        return _json.loads(buf.getvalue().strip().splitlines()[-1])

    r1 = run()
    assert {s["stage"] for s in r1["funnel"]} >= {"4_kept", "1_too_short"}
    assert r1["n_curated"] > 0
    got = spark.read.parquet(str(out))
    assert got.count() == r1["n_curated"]
    assert run()["n_curated"] == r1["n_curated"]  # deterministic


# ---------------------------------------------------------------------------
# Named session registry (reference sessions.go:132-210, store.go:22-30)
# ---------------------------------------------------------------------------


def test_session_registry_lifecycle(spark, tiny_routed, tmp_path):
    """save → list → load → export → import → delete, with the conflict,
    cap, and name-validation rules of the reference store."""
    import pytest

    from otlp_cardinality_checker_spark.operators.session_store import (
        InvalidSessionNameError,
        SessionExistsError,
        SessionNotFoundError,
        SessionStore,
        TooManySessionsError,
    )
    from otlp_cardinality_checker_spark.operators.sessions import (
        estimate,
        snapshot_key_stats,
    )

    store = SessionStore(str(tmp_path / "registry"), max_sessions=3)
    snap = snapshot_key_stats(tiny_routed)

    meta = store.save(snap, "baseline", description="first run")
    assert meta["id"] == "baseline" and meta["n_keys"] > 0

    # conflict unless forced
    with pytest.raises(SessionExistsError):
        store.save(snap, "baseline")
    store.save(snap, "baseline", force=True)  # overwrite is fine

    # loaded session estimates identically to the in-memory snapshot
    want = sorted(
        tuple(r) for r in estimate(snap).drop("hll", "samples").collect()
    )
    got = sorted(
        tuple(r)
        for r in estimate(store.load(spark, "baseline"))
        .drop("hll", "samples")
        .collect()
    )
    assert got == want

    # name validation mirrors the reference regex
    for bad in ("", "Has Spaces", "UPPER", "a" * 129, "dots.bad"):
        with pytest.raises(InvalidSessionNameError):
            store.save(snap, bad)

    # cap binds for NEW names only (overwrites always allowed)
    store.save(snap, "second")
    store.save(snap, "third")
    with pytest.raises(TooManySessionsError):
        store.save(snap, "fourth")
    store.save(snap, "third", force=True)

    names = [m["id"] for m in store.list()]
    assert sorted(names) == ["baseline", "second", "third"]

    # export → delete → import roundtrip (optionally renamed)
    bundle = store.export_session("baseline", str(tmp_path / "b.tar.gz"))
    store.delete("baseline")
    assert not store.exists("baseline")
    with pytest.raises(SessionNotFoundError):
        store.load(spark, "baseline")
    meta2 = store.import_session(bundle, name="restored")
    assert meta2["id"] == "restored"
    got2 = sorted(
        tuple(r)
        for r in estimate(store.load(spark, "restored"))
        .drop("hll", "samples")
        .collect()
    )
    assert got2 == want


def test_session_registry_size_cap(spark, tiny_routed, tmp_path):
    import pytest

    from otlp_cardinality_checker_spark.operators.session_store import (
        SessionStore,
        SessionTooLargeError,
    )
    from otlp_cardinality_checker_spark.operators.sessions import (
        snapshot_key_stats,
    )

    store = SessionStore(str(tmp_path / "reg"), max_session_bytes=64)
    with pytest.raises(SessionTooLargeError):
        store.save(snapshot_key_stats(tiny_routed), "toobig")
    assert store.list() == []  # staging cleaned, nothing published


def test_session_registry_ignores_crashed_staging(spark, tiny_routed, tmp_path):
    """A crashed save leaves a .staging-* dir containing meta.json; it must
    not appear in list() or count toward the session cap."""
    import json as _json

    from otlp_cardinality_checker_spark.operators.session_store import (
        SessionStore,
    )
    from otlp_cardinality_checker_spark.operators.sessions import (
        snapshot_key_stats,
    )

    store = SessionStore(str(tmp_path / "reg"), max_sessions=2)
    store.save(snapshot_key_stats(tiny_routed), "only")
    ghost = tmp_path / "reg" / ".staging-ghost"
    (ghost / "data").mkdir(parents=True)
    (ghost / "meta.json").write_text(_json.dumps({"id": "ghost", "created": "z"}))
    assert [m["id"] for m in store.list()] == ["only"]
    # cap still has one free slot — the ghost must not consume it
    store.save(snapshot_key_stats(tiny_routed), "second")


def test_cli_sessions_lifecycle(tmp_path, spark, capsys):
    """End-to-end `sessions` subcommand: save a named session from the
    pipeline, list it, export the bundle, delete, re-import, and verify
    the conflict path returns a non-zero exit."""
    import json as _json

    from otlp_cardinality_checker_spark.__main__ import main

    store = str(tmp_path / "reg")
    base = ["--sf-dir", "/root/testdata/sf0.001", "--cores", "8"]

    assert main(base + ["sessions", "save", "--name", "r3", "--store", store,
                        "--description", "cli test"]) == 0
    meta = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert meta["id"] == "r3" and meta["n_keys"] > 0

    # duplicate without --force: error path, exit 1
    assert main(base + ["sessions", "save", "--name", "r3", "--store", store]) == 1
    capsys.readouterr()

    assert main(["sessions", "list", "--store", store]) == 0
    listed = [_json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert [m["id"] for m in listed] == ["r3"]

    bundle = str(tmp_path / "r3.tar.gz")
    assert main(["sessions", "export", "--name", "r3", "--store", store,
                 "--out", bundle]) == 0
    capsys.readouterr()
    assert main(["sessions", "delete", "--name", "r3", "--store", store]) == 0
    capsys.readouterr()
    assert main(["sessions", "import", "--bundle", bundle, "--store", store]) == 0
    re_meta = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert re_meta["id"] == "r3" and re_meta["n_keys"] == meta["n_keys"]


def test_session_registry_import_enforces_size_cap(spark, tiny_routed, tmp_path):
    """import_session must honor max_session_bytes exactly like save —
    a bundle exported from a store with a larger cap cannot smuggle an
    oversized session into a stricter store."""
    import pytest

    from otlp_cardinality_checker_spark.operators.session_store import (
        SessionStore,
        SessionTooLargeError,
    )
    from otlp_cardinality_checker_spark.operators.sessions import (
        snapshot_key_stats,
    )

    big = SessionStore(str(tmp_path / "big"))
    big.save(snapshot_key_stats(tiny_routed), "huge")
    bundle = big.export_session("huge", str(tmp_path / "huge.tar.gz"))

    strict = SessionStore(str(tmp_path / "strict"), max_session_bytes=64)
    with pytest.raises(SessionTooLargeError):
        strict.import_session(bundle)
    assert strict.list() == []  # staging cleaned, nothing published
    assert not list((tmp_path / "strict").glob(".staging-*"))


def test_session_import_cleans_staging_on_malformed_bundle(tmp_path):
    """A bundle whose session dir lacks meta.json must fail the import AND
    leave no .staging-* residue behind (the cleanup must run on the error
    path, not only on success/size-cap)."""
    import tarfile

    import pytest

    from otlp_cardinality_checker_spark.operators.session_store import (
        SessionStore,
    )

    src = tmp_path / "payload" / "broken"
    (src / "data").mkdir(parents=True)
    (src / "data" / "junk.txt").write_text("no meta.json here")
    bundle = tmp_path / "broken.tar.gz"
    with tarfile.open(bundle, "w:gz") as tar:
        tar.add(src, arcname="broken")

    store = SessionStore(str(tmp_path / "reg"))
    with pytest.raises(FileNotFoundError):
        store.import_session(str(bundle))
    assert store.list() == []
    assert not list((tmp_path / "reg").glob(".staging-*"))
