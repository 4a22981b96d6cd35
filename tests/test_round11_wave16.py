"""Property pins for the round-11 wave-16 operators (KMV sketch,
temporal SCD2 join, image dHash)."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import pyarrow.parquet as pq


def test_kmv_matches_pure_python(spark, sf_dir):
    from gasket_rs_spark.operators.sketches import _KMV_K, q_kmv_distinct_sketch

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["source", "text"])
    pts = defaultdict(set)
    for s, txt in zip(t["source"].to_pylist(), t["text"].to_pylist()):
        pts[s].add(int(hashlib.md5(txt.encode()).hexdigest()[:12], 16))
    want = {}
    for s, us in pts.items():
        srt = sorted(us)
        if len(srt) >= _KMV_K:
            kth = srt[_KMV_K - 1]
            est = (_KMV_K - 1) * (1 << 48) // kth
        else:
            kth, est = 0, len(srt)
        want[s] = (
            len(srt),
            kth,
            est,
            abs(est - len(srt)) * 1_000_000 // len(srt),
        )
    got = {
        r["source"]: (r["n_distinct"], r["kth_u48"], r["est"], r["err6"])
        for r in q_kmv_distinct_sketch(spark, sf_dir).collect()
    }
    assert got == want
    # estimator quality on this corpus: within 60% everywhere (k=16 is
    # coarse; the pin guards against gross construction errors)
    assert all(e <= 600_000 for *_, e in want.values())


def test_temporal_join_scd2_matches_pure_python(spark, sf_dir):
    from gasket_rs_spark.operators.warehouse import q_temporal_join_scd2

    t = pq.read_table(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_id", "event_type", "ts", "value"],
    )
    rows = list(
        zip(
            t["user_id"].to_pylist(),
            t["event_id"].to_pylist(),
            t["event_type"].to_pylist(),
            [math.floor(x.timestamp()) for x in t["ts"].to_pylist()],
            [math.floor(v * 1e4 + 0.5) for v in t["value"].to_pylist()],
        )
    )
    dim = defaultdict(list)
    for uid, eid, et, ts, a4 in rows:
        if et == "purchase":
            dim[uid].append((ts, eid, a4))
    versions = {}
    for uid, ch in dim.items():
        ch.sort()
        versions[uid] = [
            (ts, ch[i + 1][0] if i + 1 < len(ch) else None, i + 1, a4)
            for i, (ts, _, a4) in enumerate(ch)
        ]
    agg = defaultdict(lambda: [0, set(), 0])
    for uid, eid, et, ts, _ in rows:
        if et != "click":
            continue
        hit = 0
        attr = 0
        for vf, vt, ver, a4 in versions.get(uid, []):
            if ts >= vf and (vt is None or ts < vt):
                hit, attr = ver, a4
                break
        a = agg[hit]
        a[0] += 1
        a[1].add(uid)
        a[2] += attr
    want = {v: (c, len(us), s) for v, (c, us, s) in agg.items()}
    got = {
        r["version"]: (r["n_clicks"], r["n_users"], r["attr_sum4"])
        for r in q_temporal_join_scd2(spark, sf_dir).collect()
    }
    assert got == want
    # point-in-time semantics: every click maps to exactly one version
    assert sum(c for c, _, _ in want.values()) == sum(
        1 for _, _, et, _, _ in rows if et == "click"
    )


def test_dhash_brightness_invariance_property(spark, sf_dir):
    """dHash's reason to exist: adding a constant to every pixel leaves
    the hash unchanged (aHash can flip). Checked on the kernel math."""
    from gasket_rs_spark.operators.multimodal import _RESIZE_BLOCKS

    def dhash(pixels):
        p = len(pixels) // 3
        bounds = [b * p // _RESIZE_BLOCKS for b in range(_RESIZE_BLOCKS + 1)]
        sums = [
            sum(pixels[3 * bounds[b]: 3 * bounds[b + 1]])
            for b in range(_RESIZE_BLOCKS)
        ]
        widths = [bounds[b + 1] - bounds[b] for b in range(_RESIZE_BLOCKS)]
        h = 0
        for b in range(_RESIZE_BLOCKS - 1):
            if sums[b] * widths[b + 1] > sums[b + 1] * widths[b]:
                h |= 1 << b
        return h

    base = [((i * 37) % 200) for i in range(3 * 40)]
    shifted = [x + 55 for x in base]
    assert dhash(base) == dhash(shifted)


def test_dhash_groups_match_recount(spark, sf_dir):
    from gasket_rs_spark.operators.multimodal import q_image_dhash_dedup

    rows = q_image_dhash_dedup(spark, sf_dir).collect()
    assert rows
    assert all(r["n_images"] >= 2 for r in rows)
    assert all(0 <= r["dhash"] < 128 for r in rows)
