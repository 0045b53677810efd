"""Regression fixtures for the round-12 ADVICE items:

1. recover_codebook_index must FINISH a committed swap for every
   relation whose tmp subdir still exists — including relations whose
   live dir is intact because the crash hit BETWEEN per-relation swaps
   (index already swapped in, manifest/codebook not yet). The old
   condition ("committed and live missing") would reap the committed
   tmp and permanently pair the NEW index with the OLD
   manifest/codebook — serve-path cell routing silently wrong.
2. x176's stage tag must carry the corpus fingerprint (like x173/c05/
   x171): a corpus regenerated at the same sf_dir must not reuse the
   stale persisted index + graph sidecar. The convention now lives in
   plans/extensions._fp_tag, which both x173 and x176 call.
3. scripts/round_close._load_ratio must use a TRUE median of the
   per-shape sentinel ratios — ratios[len//2] is the upper-middle
   element for even-length lists, which would bias the load normalizer
   high whenever the two bench maps share an even number of shapes.
"""

from __future__ import annotations

import importlib.util
import os
import shutil

from pyspark.sql import functions as F


def _vec_df(spark, n=60, dim=8, seed=7):
    import numpy as np

    rng = np.random.default_rng(seed)
    rows = [
        (int(i), [float(x) for x in rng.normal(size=dim)]) for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


# ---------------------------------------------------------------- 1 ----
def test_recover_finishes_cross_relation_committed_swap(spark, tmp_path):
    """Crash window: retrain committed, `index` swap fully completed
    (live index is the NEW one), `manifest`/`codebook` still pending in
    tmp. recover must adopt the pending relations — not skip them
    because their live dirs exist, then reap the only copy."""
    from gwasdb_spark.operators.ann_index import (
        build_codebook_index,
        load_codebook,
        read_cell_index,
        recover_codebook_index,
    )

    base = os.path.join(str(tmp_path), "cbx")
    # OLD layout: 4 cells over 60 vectors
    build_codebook_index(_vec_df(spark, n=60, seed=1), base, n_cells=4,
                         seed=1)
    # NEW layout staged in tmp: 3 cells over 40 vectors (distinguishable
    # from the old one by both codebook size and row count)
    tmp = os.path.join(base, "_retrain.tmp")
    build_codebook_index(_vec_df(spark, n=40, seed=2), tmp, n_cells=3,
                         seed=2)
    with open(os.path.join(tmp, "_COMMITTED"), "w") as fh:
        fh.write("x\n")
    # Simulate the index swap having COMPLETED (live=new, old reaped,
    # tmp/index gone) while manifest/codebook never swapped.
    dead = os.path.join(base, "index.dead")
    os.rename(os.path.join(base, "index"), dead)
    os.rename(os.path.join(tmp, "index"), os.path.join(base, "index"))
    shutil.rmtree(dead)

    recover_codebook_index(base)

    assert not os.path.exists(tmp)
    for rel in ("index", "manifest", "codebook"):
        assert os.path.isdir(os.path.join(base, rel))
        assert not os.path.exists(os.path.join(base, rel + ".old"))
    # ALL relations are the new layout — index/manifest/codebook agree
    assert len(load_codebook(spark, base)) == 3
    idx = read_cell_index(spark, base)
    assert idx.count() == 40
    man = spark.read.parquet(os.path.join(base, "manifest"))
    assert man.count() == 40
    # manifest routes exactly the index's rows (the wrong-pairing bug
    # this fix closes: new index + old manifest disagree on cells)
    diff = (
        idx.select("vec_id", "cell")
        .exceptAll(man.select("vec_id", "cell"))
        .count()
    )
    assert diff == 0


def test_recover_restores_half_renamed_relation(tmp_path):
    """Crash between rename(live, old) and rename(tmp, live) with the
    committed tmp relation already adopted by a PREVIOUS recover pass
    that then died: an `.old` with no live and no tmp is restored, not
    stranded."""
    from gwasdb_spark.operators.ann_index import recover_codebook_index

    base = os.path.join(str(tmp_path), "cbr")
    for rel in ("index", "manifest", "codebook"):
        os.makedirs(os.path.join(base, rel))
        with open(os.path.join(base, rel, "marker"), "w") as fh:
            fh.write(rel)
    # half-renamed: codebook moved aside, nothing replaced it
    os.rename(
        os.path.join(base, "codebook"), os.path.join(base, "codebook.old")
    )
    recover_codebook_index(base)
    assert os.path.isdir(os.path.join(base, "codebook"))
    assert not os.path.exists(os.path.join(base, "codebook.old"))
    with open(os.path.join(base, "codebook", "marker")) as fh:
        assert fh.read() == "codebook"


# ---------------------------------------------------------------- 2 ----
def test_fp_tag_tracks_corpus_regeneration(tmp_path):
    from gwasdb_spark.plans.extensions import _fp_tag

    sf = str(tmp_path)
    doc = os.path.join(sf, "documents.parquet")
    with open(doc, "wb") as fh:
        fh.write(b"a" * 100)
    t1 = _fp_tag(sf)
    os.utime(doc, ns=(1, 1))  # same path, regenerated content
    t2 = _fp_tag(sf)
    assert t1 != t2
    # the path-unique md5 prefix is stable across regeneration
    assert t1.split("_")[0] == t2.split("_")[0]


def test_persisted_store_queries_use_fingerprint_tag():
    """x176 (the ADVICE item) and x173 must derive their stage keys via
    _fp_tag, so the key can never silently drop the regeneration
    sensitivity again. st22's streaming-graph row follows the same
    convention (inline, beside mining_ops' own _corpus_fingerprint)."""
    import inspect

    from gwasdb_spark.plans import extensions as E
    from gwasdb_spark.plans import mining_ops as M

    assert "_fp_tag(sf_dir)" in inspect.getsource(E.x176_ann_graph_maintain)
    assert "_fp_tag(sf_dir)" in inspect.getsource(E.x173_incremental_ingest)
    assert "_corpus_fingerprint(sf_dir)" in inspect.getsource(
        M.st22_stream_graph_ann
    )


# ---------------------------------------------------------------- 3 ----
def _load_round_close():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "round_close", os.path.join(repo, "scripts", "round_close.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_load_ratio_true_median_for_even_shape_count():
    rc = _load_round_close()
    # two shared shapes: ratios 1.0 and 2.0 — a true median is 1.5; the
    # old upper-middle pick returned 2.0 and tripped/masked the gate
    new = {"sentinels": {"scan": 1.0, "shuffle": 4.0}}
    old = {"sentinels": {"scan": 1.0, "shuffle": 2.0}}
    ratio, how = rc._load_ratio(new, old)
    assert how.startswith("basket-median")
    assert abs(ratio - 1.5) < 1e-12
    # odd-length behavior unchanged
    new3 = {"sentinels": {"scan": 1.0, "shuffle": 2.0, "window": 3.0}}
    old3 = {"sentinels": {"scan": 1.0, "shuffle": 1.0, "window": 1.0}}
    ratio3, _ = rc._load_ratio(new3, old3)
    assert abs(ratio3 - 2.0) < 1e-12
