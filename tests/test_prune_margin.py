"""Margin-based probe pruning (ops/ivf_batch.route_union prune_margin).

The 10M-tier Q=32 IVF scan is HBM-bound on the probed-union bytes
(CLAUDE.md); a fixed nprobe forces every query to read its full long tail
of low-scoring probes. The margin drops probes whose centroid score trails
the query's best by more than `prune_margin` — this test pins the
recall/bytes trade on a clustered corpus (the regime IVF exists for):
>= 25% fewer active clusters at >= 97% of the unpruned recall.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from memex_tpu.index import IVFIndex
from memex_tpu.ops.ivf_batch import route_union


@pytest.fixture
def clustered(scope="module"):
    """Mixture-of-gaussians corpus (benchmarks/datasets.py parameters:
    cos(point, center) ~ 0.8, matching intra-topic sentence-embedding
    similarity)."""
    rng = np.random.default_rng(0)
    d, centers_n, n = 32, 64, 20000
    centers = rng.standard_normal((centers_n, d)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    sigma = 0.75 / np.sqrt(d)
    asg = rng.integers(0, centers_n, n)
    db = centers[asg] + sigma * rng.standard_normal((n, d)).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    qasg = rng.integers(0, centers_n, 32)
    qs = centers[qasg] + sigma * rng.standard_normal((32, d)).astype(np.float32)
    qs /= np.linalg.norm(qs, axis=1, keepdims=True)
    return db, qs


def _recall(hits, exact_ids, k=10):
    return np.mean([
        len({sid for sid, _ in hits[i][:k]} & set(exact_ids[i])) / k
        for i in range(len(hits))
    ])


def test_margin_cuts_union_at_near_full_recall(clustered):
    db, qs = clustered
    n = db.shape[0]
    exact = np.argsort(-(qs @ db.T), axis=1)[:, :10]
    exact_ids = [[f"r{j}" for j in row] for row in exact]

    idx = IVFIndex(dim=32, n_clusters=64, nprobe=16, dtype="int8",
                   use_fused=True)
    idx._interpret = True  # batch-union kernel in Pallas interpret mode
    idx.build(db, [f"r{i}" for i in range(n)])

    # Routing stats: the margin must actually shrink the probed union.
    cents = idx.centroids
    _, nact_full = route_union(cents, jnp.asarray(qs), 16)
    _, nact_pruned = route_union(cents, jnp.asarray(qs), 16,
                                 prune_margin=0.25)
    full, pruned = int(nact_full[0]), int(nact_pruned[0])
    assert pruned < full, (full, pruned)
    assert pruned <= 0.75 * full, f"only {full}->{pruned} clusters"

    rec_full = _recall(idx.search(qs, 10), exact_ids)
    idx.prune_margin = 0.25
    rec_pruned = _recall(idx.search(qs, 10), exact_ids)
    assert rec_pruned >= 0.97 * rec_full, (rec_full, rec_pruned)
    assert rec_pruned >= 0.9


def test_margin_off_is_identical(clustered):
    db, qs = clustered
    cents_rng = np.random.default_rng(1)
    cents = cents_rng.standard_normal((64, 32)).astype(np.float32)
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    a = route_union(jnp.asarray(cents), jnp.asarray(qs), 8)
    b = route_union(jnp.asarray(cents), jnp.asarray(qs), 8, prune_margin=None)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    assert int(a[1][0]) == int(b[1][0])


def test_huge_margin_is_noop(clustered):
    db, qs = clustered
    rng = np.random.default_rng(2)
    cents = rng.standard_normal((64, 32)).astype(np.float32)
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    a = route_union(jnp.asarray(cents), jnp.asarray(qs), 8)
    b = route_union(jnp.asarray(cents), jnp.asarray(qs), 8, prune_margin=10.0)
    assert int(a[1][0]) == int(b[1][0])


def test_store_uri_accepts_prune_margin(tmp_path):
    from memex_tpu.store import get_vector_storage

    store = get_vector_storage(
        f"tpu+ivf://{tmp_path}/v?nprobe=8&prune_margin=0.2", "pm", dim=32)
    assert store.index.prune_margin == 0.2


def test_calibrate_margin_ivf(clustered):
    """calibrate_margin picks a margin that (a) holds the overlap target
    against the unpruned search and (b) actually shrinks the probed union."""
    db, qs = clustered
    n = db.shape[0]
    idx = IVFIndex(dim=32, n_clusters=64, nprobe=16, dtype="int8",
                   use_fused=True)
    idx._interpret = True
    idx.build(db, [f"r{i}" for i in range(n)])

    m = idx.calibrate_margin(queries=qs, target_overlap=0.9)
    assert m is not None and idx.prune_margin == m

    # Verify the promise on held-out queries from the same distribution.
    idx.prune_margin = None
    base = idx.search(qs, 10)
    idx.prune_margin = m
    pruned = idx.search(qs, 10)
    overlap = np.mean([
        len({s for s, _ in base[i]} & {s for s, _ in pruned[i]})
        / max(len(base[i]), 1)
        for i in range(len(base))
    ])
    assert overlap >= 0.9, (m, overlap)

    _, nact_full = route_union(idx.centroids, jnp.asarray(qs), 16)
    _, nact_m = route_union(idx.centroids, jnp.asarray(qs), 16,
                            prune_margin=m)
    assert int(nact_m[0]) < int(nact_full[0]), m


def test_calibrate_margin_sampled_queries(clustered):
    """Corpus-sampled probe queries (no caller queries) also calibrate."""
    from memex_tpu.index.ivf import sample_corpus_queries

    db, _ = clustered
    n = db.shape[0]
    idx = IVFIndex(dim=32, n_clusters=64, nprobe=16, dtype="int8",
                   use_fused=True)
    idx._interpret = True
    idx.build(db, [f"r{i}" for i in range(n)])

    sq = sample_corpus_queries(idx, 16, seed=3)
    assert sq.shape == (16, 32)
    np.testing.assert_allclose(np.linalg.norm(sq, axis=1), 1.0, atol=1e-5)

    m = idx.calibrate_margin(n_queries=16, target_overlap=0.9, seed=3)
    # On a 64-topic mixture some margin always holds 0.9 overlap.
    assert m is not None


def test_calibrate_margin_empty_index():
    idx = IVFIndex(dim=32, n_clusters=8, nprobe=4, dtype="int8")
    assert idx.calibrate_margin() is None
    assert idx.prune_margin is None


def test_calibrate_margin_sharded(clustered):
    from jax.sharding import Mesh

    from memex_tpu.index.sharded_ivf import ShardedIVFIndex

    db, qs = clustered
    n = db.shape[0]
    mesh = Mesh(np.array(jax.devices()[:4]), ("shard",))
    idx = ShardedIVFIndex(dim=32, mesh=mesh, n_clusters=64, nprobe=16,
                          use_fused=False)
    idx.build(db, [f"r{i}" for i in range(n)])

    m = idx.calibrate_margin(queries=qs, target_overlap=0.9)
    assert m is not None and idx.prune_margin == m
    # Dynamic margin: the calibration sweep + both margin settings must
    # all ride ONE compiled executable per (kk) — no per-margin entries.
    assert len(idx._search_cache) == 1, list(idx._search_cache)


def test_store_prune_target_calibrates_on_first_search(clustered, tmp_path):
    from memex_tpu.store import get_vector_storage
    from memex_tpu.store.base import VectorData

    db, qs = clustered
    store = get_vector_storage(
        f"tpu+ivf://{tmp_path}/v?nprobe=16&n_clusters=64&prune_target=0.9",
        "cal", dim=32)
    store.build([
        VectorData(id=f"r{i}", document_id="d", text="", vector=db[i],
                   segment_id=i)
        for i in range(2048)
    ])
    assert store.index.prune_margin is None  # lazy: not yet searched
    store.search_batch(qs[:4], 5)
    assert store._calibrated
    # Rebuild invalidates the operating point; next search recalibrates.
    store.rebuild()
    assert store.index.prune_margin is None and not store._calibrated
    store.search_batch(qs[:4], 5)
    assert store._calibrated


def test_mesh_store_prune_target_calibrates(clustered, tmp_path):
    from memex_tpu.store import get_vector_storage
    from memex_tpu.store.base import VectorData

    db, qs = clustered
    store = get_vector_storage(
        f"tpu+ivf+mesh://{tmp_path}/vm?nprobe=16&n_clusters=64"
        "&use_fused=0&prune_target=0.9",
        "calm", dim=32)
    store.build([
        VectorData(id=f"r{i}", document_id="d", text="", vector=db[i],
                   segment_id=i)
        for i in range(4096)
    ])
    assert store.index.prune_margin is None
    store.search_batch(qs[:4], 10)  # k=10: shares the calibration kk
    assert store._calibrated
    # One SPMD executable covered the serving search + the whole
    # calibration sweep (the margin is a dynamic arg, not a cache key).
    assert len(store.index._search_cache) == 1


def test_sharded_ivf_prune_margin_recall(clustered):
    import jax
    from jax.sharding import Mesh

    from memex_tpu.index.sharded_ivf import ShardedIVFIndex

    db, qs = clustered
    n = db.shape[0]
    mesh = Mesh(np.array(jax.devices()[:4]), ("shard",))
    exact = np.argsort(-(qs @ db.T), axis=1)[:, :10]
    exact_ids = [[f"r{j}" for j in row] for row in exact]

    full = ShardedIVFIndex(dim=32, mesh=mesh, n_clusters=64, nprobe=16,
                           use_fused=False)
    full.build(db, [f"r{i}" for i in range(n)])
    rec_full = _recall(full.search(qs, 10), exact_ids)

    pruned = ShardedIVFIndex(dim=32, mesh=mesh, n_clusters=64, nprobe=16,
                             use_fused=False, prune_margin=0.25)
    pruned.build(db, [f"r{i}" for i in range(n)])
    rec_pruned = _recall(pruned.search(qs, 10), exact_ids)
    assert rec_pruned >= 0.97 * rec_full, (rec_full, rec_pruned)


# -- recall-target calibration (round-2 verdict item 6) ------------------------


def test_calibrate_recall_target_vs_exact(clustered):
    """target_metric='recall' calibrates against a full-probe baseline
    (routing loss included), so the chosen margin holds recall vs the
    exact oracle — not just overlap vs the already-lossy nprobe search."""
    db, qs = clustered
    n = db.shape[0]
    exact = np.argsort(-(qs @ db.T), axis=1)[:, :10]
    exact_ids = [[f"r{j}" for j in row] for row in exact]

    idx = IVFIndex(dim=32, n_clusters=64, nprobe=16, dtype="int8",
                   use_fused=False)
    idx.build(db, [f"r{i}" for i in range(n)])
    m = idx.calibrate_margin(queries=qs, target_overlap=0.95,
                             target_metric="recall")
    assert idx.nprobe == 16  # restored after the full-probe baseline
    rec = _recall(idx.search(qs, 10), exact_ids)
    # The guarantee is vs the int8 full-probe baseline; allow quantization
    # slack against the f32 oracle.
    assert rec >= 0.92, (m, rec)


def test_calibrate_recall_on_fixture_embeddings(clustered):
    """Embedding-distributed vectors, not Gaussians: encode real sentences
    through the (deterministic random-weight) MiniLM architecture and pin
    the calibrated operating point's recall vs exact on those vectors."""
    import sys

    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from test_encoder import tiny_engine

    eng = tiny_engine()
    topics = ("congress votes on the economy", "the war in ukraine",
              "insulin and health care costs", "police reform and safety",
              "jobs and manufacturing growth", "climate and clean energy",
              "taxes on corporations", "fentanyl and the opioid crisis",
              "roads bridges and infrastructure", "schools and teachers",
              "veterans benefits and care", "the southern border",
              "small business investment", "prescription drug prices",
              "voting rights legislation", "semiconductor chip factories")
    fillers = ("today", "this year", "for families", "across america",
               "in every state", "for the middle class", "right now",
               "again")
    rng = np.random.default_rng(5)
    # Unique suffix per text: duplicate texts embed identically and the
    # id-level recall metric then undercounts on tie-broken ranks.
    texts = [f"{topics[rng.integers(len(topics))]} "
             f"{fillers[rng.integers(len(fillers))]} "
             f"{fillers[rng.integers(len(fillers))]} item {i}"
             for i in range(1024)]
    vecs = eng.encode_batch(texts)
    vecs = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)

    qs = vecs[:24]
    exact = np.argsort(-(qs @ vecs.T), axis=1)[:, :10]
    exact_ids = [[f"t{j}" for j in row] for row in exact]

    # f32 storage isolates routing+pruning loss (what this test pins):
    # near-duplicate embeddings sit ~0.001 apart in cosine, so int8
    # noise alone reorders top-10 ranks regardless of pruning.
    idx = IVFIndex(dim=vecs.shape[1], n_clusters=16, nprobe=8,
                   dtype="float32", use_fused=False)
    idx.build(vecs, [f"t{i}" for i in range(len(texts))])
    idx.calibrate_margin(queries=qs, target_overlap=0.95,
                         target_metric="recall")
    rec = _recall(idx.search(qs, 10), exact_ids)
    assert rec >= 0.95, rec


def test_sharded_calibrate_recall_target(clustered):
    import jax
    from jax.sharding import Mesh

    from memex_tpu.index.sharded_ivf import ShardedIVFIndex

    db, qs = clustered
    n = db.shape[0]
    mesh = Mesh(np.array(jax.devices()[:4]), ("shard",))
    exact = np.argsort(-(qs @ db.T), axis=1)[:, :10]
    exact_ids = [[f"r{j}" for j in row] for row in exact]

    idx = ShardedIVFIndex(dim=32, mesh=mesh, n_clusters=64, nprobe=16,
                          use_fused=False)
    idx.build(db, [f"r{i}" for i in range(n)])
    idx.calibrate_margin(queries=qs, target_overlap=0.95,
                         target_metric="recall")
    assert idx.nprobe == 16
    rec = _recall(idx.search(qs, 10), exact_ids)
    assert rec >= 0.92, rec


# -- joint (nprobe, margin) operating-point calibration -------------------------


def test_operating_point_lifts_capped_nprobe(clustered):
    """When the configured nprobe itself caps recall below the floor, no
    margin can lift it (pruning only drops probes) — the nprobe ladder
    can. Round-2 verdict item 6: the realtext corpus sat at 0.35 recall
    with nprobe=8/64 while the margin calibration reported success."""
    db, _ = clustered
    n = db.shape[0]
    # Straddling queries — midpoints of rows from different regions — so
    # the true top-10 splits across clusters and nprobe=1 CANNOT hold the
    # floor (single-cluster queries are trivially routable at nprobe=1).
    rng = np.random.default_rng(3)
    a, b = rng.integers(0, n, 32), rng.integers(0, n, 32)
    qs = db[a] + db[b]
    qs /= np.linalg.norm(qs, axis=1, keepdims=True)
    exact = np.argsort(-(qs @ db.T), axis=1)[:, :10]
    exact_ids = [[f"r{j}" for j in row] for row in exact]

    idx = IVFIndex(dim=32, n_clusters=64, nprobe=1, dtype="float32",
                   use_fused=False)
    idx.build(db, [f"r{i}" for i in range(n)])
    rec_before = _recall(idx.search(qs, 10), exact_ids)
    assert rec_before < 0.95  # nprobe=1 must actually be the bottleneck

    pt = idx.calibrate_operating_point(queries=qs, target_recall=0.95)
    assert pt is not None
    assert idx.nprobe == pt["nprobe"] > 1
    # The sweep is the evidence trail: ascending nprobe, last rung holds.
    rungs = [s["nprobe"] for s in pt["sweep"]]
    assert rungs == sorted(rungs)
    assert pt["sweep"][-1]["recall_vs_full"] >= 0.95
    rec = _recall(idx.search(qs, 10), exact_ids)
    assert rec >= 0.95, (pt, rec)


def test_operating_point_keeps_sufficient_nprobe(clustered):
    """A corpus-adequate nprobe is kept (first rung already holds), and
    the margin sweep still runs to buy bytes back under the floor."""
    db, qs = clustered
    n = db.shape[0]
    idx = IVFIndex(dim=32, n_clusters=64, nprobe=16, dtype="float32",
                   use_fused=False)
    idx.build(db, [f"r{i}" for i in range(n)])
    pt = idx.calibrate_operating_point(queries=qs, target_recall=0.9)
    assert pt["nprobe"] == 16 and len(pt["sweep"]) == 1


def test_operating_point_on_fixture_embeddings(clustered):
    """The round-2 failure mode end-to-end: embedding-distributed vectors
    (deterministic random-weight MiniLM on real sentences), a too-low
    configured nprobe, and a 0.95 floor vs the f32 exact oracle."""
    import sys

    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from test_encoder import tiny_engine

    eng = tiny_engine()
    words = ("economy congress health police jobs climate taxes schools "
             "border veterans voting chips roads drugs energy war").split()
    rng = np.random.default_rng(11)
    texts = [" ".join(rng.choice(words, size=6)) + f" item {i}"
             for i in range(1024)]
    vecs = eng.encode_batch(texts)
    vecs = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)

    qs = vecs[:24]
    exact = np.argsort(-(qs @ vecs.T), axis=1)[:, :10]
    exact_ids = [[f"t{j}" for j in row] for row in exact]

    idx = IVFIndex(dim=vecs.shape[1], n_clusters=16, nprobe=1,
                   dtype="float32", use_fused=False)
    idx.build(vecs, [f"t{i}" for i in range(len(texts))])
    pt = idx.calibrate_operating_point(queries=qs, target_recall=0.95)
    rec = _recall(idx.search(qs, 10), exact_ids)
    assert rec >= 0.95, (pt, rec)


def test_sharded_operating_point(clustered):
    import jax
    from jax.sharding import Mesh

    from memex_tpu.index.sharded_ivf import ShardedIVFIndex

    db, _ = clustered
    n = db.shape[0]
    mesh = Mesh(np.array(jax.devices()[:4]), ("shard",))
    rng = np.random.default_rng(3)
    a, b = rng.integers(0, n, 32), rng.integers(0, n, 32)
    qs = db[a] + db[b]
    qs /= np.linalg.norm(qs, axis=1, keepdims=True)
    exact = np.argsort(-(qs @ db.T), axis=1)[:, :10]
    exact_ids = [[f"r{j}" for j in row] for row in exact]

    idx = ShardedIVFIndex(dim=32, mesh=mesh, n_clusters=64, nprobe=1,
                          use_fused=False)
    idx.build(db, [f"r{i}" for i in range(n)])
    pt = idx.calibrate_operating_point(queries=qs, target_recall=0.95)
    assert pt["nprobe"] > 1
    rec = _recall(idx.search(qs, 10), exact_ids)
    assert rec >= 0.92, (pt, rec)  # int8 storage slack vs the f32 oracle


def test_store_recall_target_calibrates(clustered, tmp_path):
    """URI surface: recall_target jointly lifts nprobe + sets the margin
    on the first search; rebuild invalidates the point."""
    from memex_tpu.store import get_vector_storage
    from memex_tpu.store.base import VectorData

    db, qs = clustered
    store = get_vector_storage(
        f"tpu+ivf://{tmp_path}/v?nprobe=1&n_clusters=64&use_fused=0"
        "&dtype=float32&recall_target=0.95",
        "calop", dim=32)
    store.build([
        VectorData(id=f"r{i}", document_id="d", text="", vector=db[i],
                   segment_id=i)
        for i in range(4096)
    ])
    assert store.index.nprobe == 1
    store.search_batch(qs[:4], 10)
    assert store._calibrated and store.index.nprobe > 1
    store.rebuild()
    assert not store._calibrated


def test_operating_point_restores_on_midsweep_failure(clustered, monkeypatch):
    """Advisor r3 (low): a transient failure mid-sweep must not leave the
    SERVING operating point at an arbitrary ladder rung (possibly full
    probe) with the margin cleared — restore and re-raise."""
    db, qs = clustered
    n = db.shape[0]
    idx = IVFIndex(dim=32, n_clusters=64, nprobe=2, dtype="float32",
                   use_fused=False)
    idx.build(db, [f"r{i}" for i in range(n)])
    idx.prune_margin = 0.123
    calls = {"n": 0}
    orig = type(idx).search

    def flaky(self, *a, **kw):
        calls["n"] += 1
        if calls["n"] > 1:  # let the full-probe baseline through
            raise RuntimeError("tunnel hiccup")
        return orig(self, *a, **kw)

    monkeypatch.setattr(type(idx), "search", flaky)
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="tunnel hiccup"):
        idx.calibrate_operating_point(queries=qs, target_recall=0.95)
    assert idx.nprobe == 2 and idx.prune_margin == 0.123


def test_scan_precision_highest_requires_f32():
    """Advisor r3 (low): quantized tiers silently ignored the exact flag
    on the fused path but applied it on the XLA fallback — two score
    resolutions for one config. The contract is now enforced loudly."""
    import pytest as _pytest

    from memex_tpu.index import FlatIndex
    FlatIndex(dim=32, dtype="float32", scan_precision="highest")  # ok
    with _pytest.raises(AssertionError, match="float32"):
        FlatIndex(dim=32, dtype="int8", scan_precision="highest")
    with _pytest.raises(AssertionError, match="float32"):
        IVFIndex(dim=32, n_clusters=8, dtype="int8",
                 scan_precision="highest")
