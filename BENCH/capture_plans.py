#!/usr/bin/env python
"""Capture physical plans of the key operators → BENCH/PLANS.md, and ASSERT
the plan properties the engine is designed around (predicate pushdown into
the parquet scan, column pruning, broadcast joins for small sides,
whole-stage codegen on the relational parts). Run after operator changes:
    python BENCH/capture_plans.py
Exits nonzero if a required plan property disappears (plan regression gate).
"""
import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from xcube_stac_spark import synth
from xcube_stac_spark.session import get_spark
from xcube_stac_spark.operators import spatial, tiles
from xcube_stac_spark.plans import cube as cube_plan
from xcube_stac_spark.sources.catalog import SceneCatalog


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def main() -> int:
    spark = get_spark("plans", master="local[4]")
    sdir = synth.generate("sf0.01")
    cat = SceneCatalog(spark, sdir)
    grid = synth.default_grid("sf0.01")
    checks: list[tuple[str, str, list[str]]] = []

    # 1. search_scenes: every predicate must reach the parquet scan
    searched = spatial.search_scenes(
        cat.scenes(), bbox=[11.0, 49.0, 12.5, 50.0],
        time_range=("2025-06-02", "2025-06-20"),
    ).select("item_id")
    checks.append((
        "search_scenes (F1/F2/F5 pushdown + pruning)", plan_of(searched),
        [r"PushedFilters: \[.*IsNotNull", r"ReadSchema: [^\n]*item_id"],
    ))

    # 2a. small-region spatial join: MAP-ONLY (arrays_overlap literal) —
    # no Exchange anywhere in the plan
    sj_small = spatial.spatial_join_region(cat.scenes(), [11.4, 49.3, 12.3, 50.0])
    p_small = plan_of(sj_small)
    checks.append((
        "spatial_join_region small region (J1 map-only literal-cells path)",
        p_small,
        [r"arrays_overlap"],
    ))
    if re.search(r"Exchange", p_small):
        checks.append(("spatial_join_region small region has NO shuffle", p_small, [r"\bNOSUCHTOKEN\b"]))

    # 2b. large-region spatial join: broadcast semi-join on cell id
    sj_big = spatial.spatial_join_region(cat.scenes(), [-30.0, 20.0, 60.0, 70.0])
    checks.append((
        "spatial_join_region large region (J1 broadcast coarse join)",
        plan_of(sj_big),
        [r"BroadcastHashJoin|BroadcastNestedLoopJoin", r"LeftSemi"],
    ))

    # 3. dedup window before any image join (dedup-before-work)
    scenes = cube_plan.select_scenes(cat, grid.bbox(), ("2025-06-01", "2025-06-30"))
    imgs = cube_plan.scene_images(cat, scenes, ["B02"])
    p3 = plan_of(imgs)
    checks.append((
        "scene_images (J2 window + F6 band filter + image join)", p3,
        [r"Window", r"PushedFilters: \[[^\]]*(In|EqualTo)\(band", r"BroadcastHashJoin"],
    ))

    # 4. whole-stage codegen on the engine's filter expressions (AQE-wrapped
    # plans only annotate codegen ids after execution, so this asserts on
    # the non-adaptive search plan, which carries `[codegen id : n]` tags)
    checks.append((
        "search filter expressions (whole-stage codegen spans)",
        plan_of(searched),
        [r"\[codegen id : \d+\]"],
    ))

    # 5. knn: single window over the deduped tile aggregate
    knn = spatial.knn_scenes(cat.scenes(), 12.0, 49.5, 3)
    checks.append(("knn_scenes (J4)", plan_of(knn), [r"Window", r"HashAggregate"]))

    # 6. banded ANN near-dup: candidates come from an EQUI-join on
    # (band, key) — a hash join, never a cartesian/nested-loop product
    import __spark_entry__ as entry_mod
    from xcube_stac_spark.operators import ann as ann_op

    near = ann_op.near_dup_pairs(
        entry_mod._aug_emb(spark, "/root/testdata/sf0.01"), threshold=0.9
    )
    p6 = plan_of(near)
    checks.append((
        "ann.near_dup_pairs (banded LSH equi-join + exact verify)", p6,
        [
            r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin",
            r"eft keys \[\d+\]: \[band#",  # join keyed on the band column
        ],
    ))
    if re.search(r"CartesianProduct|BroadcastNestedLoopJoin", p6):
        checks.append((
            "ann.near_dup_pairs must not contain a product join", p6,
            [r"\bNOSUCHTOKEN\b"],
        ))

    # 7. minhash signatures: fully NARROW since r7 — per-row array_min over
    # the projected gram-hash array, NO Exchange and no gram explode at all
    # (r6 shuffled the exploded gram table for 16 static min-aggs; r01
    # additionally exploded sequence(0, 15) per gram)
    from xcube_stac_spark.operators import text as text_op

    sig = text_op.minhash_signatures(
        spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    )
    p7 = plan_of(sig)
    checks.append((
        "text.minhash_signatures (narrow array_min, no gram explode/shuffle)", p7,
        [r"array_min", r"transform"],
    ))
    # the ONLY allowed exchange is the small-file parallelize_scan
    # repartition of the raw docs (hashpartitioning on doc_id); any other
    # exchange (or a Generate) means the gram table is being exploded or
    # shuffled again
    n_exch = len(re.findall(r"\(\d+\) Exchange", p7))
    bad_exch = n_exch > 1 or (
        n_exch == 1 and not re.search(r"hashpartitioning\(doc_id#", p7)
    )
    if bad_exch or re.search(r"Generate", p7):
        checks.append((
            "minhash_signatures must not explode grams or shuffle beyond "
            "the input parallelize_scan", p7,
            [r"\bNOSUCHTOKEN\b"],
        ))

    # 8. flagship cube: the mosaic's grouping exchange hashes on the WRITE
    # key (solar_day, tile_y, tile_x) — NOT on the 4-col group key — so the
    # partitioned sink never re-shuffles the output planes
    cube = cube_plan.build_cube(cat, grid, time_range=("2025-06-01", "2025-06-30"), bands=["B02"])
    p8 = plan_of(cube)
    checks.append((
        "build_cube mosaic exchange is write-aligned (PART_COLS subset key)",
        p8,
        [r"hashpartitioning\(solar_day#\d+, tile_y#\d+, tile_x#\d+"],
    ))
    if re.search(r"hashpartitioning\([^)]*band#", p8):
        checks.append((
            "build_cube must not hash-exchange on band", p8,
            [r"\bNOSUCHTOKEN\b"],
        ))

    # 9. pack_sequences: the packing shuffle is keyed on the deterministic
    # shard and moves ONLY (doc_id, tokens) metadata — document content is
    # projected away before the exchange, and the scan itself prunes to the
    # two needed columns (doc_id + text), so the stage's bytes are
    # O(16 B/doc) regardless of corpus size
    pack = text_op.pack_sequences(
        spark.read.parquet("/root/testdata/sf0.01/documents.parquet"),
        seq_len=256, shards=8,
    )
    p9 = plan_of(pack)
    checks.append((
        "text.pack_sequences (shard-keyed metadata-only packing shuffle)",
        p9,
        [
            r"FlatMapGroupsInPandas",
            r"hashpartitioning\(shard#\d+",
            r"ReadSchema: [^\n]*doc_id[^\n]*text",
        ],
    ))
    if re.search(r"hashpartitioning\([^)]*text#", p9):
        checks.append((
            "pack_sequences must not shuffle document content", p9,
            [r"\bNOSUCHTOKEN\b"],
        ))

    # 10. decontaminate: the eval-set gram table is BROADCAST — corpus
    # grams are filtered map-side, never shuffled against the eval side
    decon = entry_mod._q_decontaminate(spark, "/root/testdata/sf0.01")
    p10 = plan_of(decon)
    checks.append((
        "text.decontaminate (broadcast eval grams, map-side corpus filter)",
        p10,
        [r"BroadcastHashJoin", r"ReadSchema: [^\n]*doc_id[^\n]*text"],
    ))
    if re.search(r"SortMergeJoin [^\n]*gram#", p10):
        checks.append((
            "decontaminate must not sort-merge corpus grams against evals",
            p10,
            [r"\bNOSUCHTOKEN\b"],
        ))

    # 11. stratified_sample: a pure narrow filter — NO Exchange anywhere,
    # and the scan prunes the document content (text/n_chars) away
    strat = entry_mod._q_stratified_sample(spark, "/root/testdata/sf0.01")
    p11 = plan_of(strat)
    checks.append((
        "sampling.stratified_sample (zero-shuffle codegen filter)",
        p11,
        [r"Filter", r"\[codegen id : \d+\]"],
    ))
    if re.search(r"Exchange", p11):
        checks.append((
            "stratified_sample must not shuffle", p11, [r"\bNOSUCHTOKEN\b"],
        ))
    if re.search(r"ReadSchema: [^\n]*text", p11):
        checks.append((
            "stratified_sample scan must prune document content", p11,
            [r"\bNOSUCHTOKEN\b"],
        ))

    failures = []
    lines = [
        "# Physical-plan audit (generated by BENCH/capture_plans.py)\n",
        "Asserted properties per operator; regenerate after operator changes.\n",
    ]
    for name, plan, pats in checks:
        ok = all(re.search(p, plan) for p in pats)
        status = "OK" if ok else "**MISSING PROPERTY**"
        if not ok:
            failures.append(name)
        lines.append(f"\n## {name} — {status}\n")
        lines.append("required: " + ", ".join(f"`{p}`" for p in pats) + "\n")
        lines.append("```\n" + plan.strip()[:4000] + "\n```\n")
    with open(os.path.join(os.path.dirname(__file__), "PLANS.md"), "w") as f:
        f.writelines(lines)
    print("plan audit:", "PASS" if not failures else f"FAIL {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
