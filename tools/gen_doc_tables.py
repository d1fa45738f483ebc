#!/usr/bin/env python
"""Regenerate README headline + PARITY coverage tables from bench artifacts.

Docs must quote committed artifacts, not best interactive runs (round-2
review finding #6): this script reads the latest BENCH_r*.json and
INTERACTIVE_r*.json and rewrites the marked blocks in README.md and
PARITY.md in place, so the numbers cannot drift from the captures.

Usage: python tools/gen_doc_tables.py [--bench BENCH_rNN.json]
The rewritten blocks are delimited by
`<!-- BEGIN GENERATED: <name> -->` / `<!-- END GENERATED: <name> -->`.
"""

import argparse
import glob
import json
import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

# reference rows: name -> (label, reference FPS, unit)
REF = {
    "sort_iou_10": ("SORT IoU, 10 objects", 9900, "FPS"),
    "sort_iou_100": ("SORT IoU, 100 objects", 561, "FPS"),
    "sort_iou_500": ("SORT IoU, 500 objects", 53, "FPS"),
    "sort_iou_oriented_100": ("SORT IoU oriented, 100 objects", 624, "FPS"),
    "sort_iou_oriented_500": ("SORT IoU oriented, 500 objects", 52, "FPS"),
    "sort_maha_100": ("SORT Maha, 100 objects", 588, "FPS"),
    "sort_maha_oriented_100": ("SORT Maha oriented, 100 objects", 636, "FPS"),
    "visual_sort_10x512": ("VisualSORT 10 obj x 512-d", 2230, "FPS"),
    "visual_sort_50x512": ("VisualSORT 50 obj x 512-d", 444, "FPS"),
    "visual_sort_100x128": ("VisualSORT 100 obj x 128-d", 262, "FPS"),
    "visual_sort_100x256": ("VisualSORT 100 obj x 256-d", 211, "FPS"),
    "visual_sort_100x512": ("VisualSORT 100 obj x 512-d", 173, "FPS"),
    "visual_sort_100x1024": ("VisualSORT 100 obj x 1024-d", 133, "FPS"),
    "visual_sort_100x2048": ("VisualSORT 100 obj x 2048-d", 94, "FPS"),
    "nms_10": ("NMS, 10 boxes", 632000, "frames/s"),
    "nms_100": ("NMS, 100 boxes", 6711, "frames/s"),
    "nms_500": ("NMS, 500 boxes", 250, "frames/s"),
    "nms_1000": ("NMS, 1000 boxes", 72, "frames/s"),
    "nms_oriented_10": ("NMS oriented, 10 boxes", 461000, "frames/s"),
    "nms_oriented_100": ("NMS oriented, 100 boxes", 7100, "frames/s"),
    "nms_oriented_300": ("NMS oriented, 300 boxes", 570, "frames/s"),
    "nms_oriented_500": ("NMS oriented, 500 boxes", 218, "frames/s"),
    "nms_oriented_1000": ("NMS oriented, 1000 boxes", 54, "frames/s"),
}

HEADLINE = [
    "sort_iou_100", "sort_iou_oriented_100", "sort_iou_500",
    "sort_iou_oriented_500",
    "visual_sort_100x512_pallas", "visual_sort_100x512",
    "batch_sort_1024x100", "batch_visual_256x100x512",
]


def fmt(v):
    if v >= 1e6:
        return f"{v / 1e6:.2f}M"
    if v >= 1e3:
        return f"{v / 1e3:.1f}k"
    return f"{v:.0f}"


def replace_block(path: Path, name: str, body: str):
    text = path.read_text()
    pat = re.compile(
        rf"(<!-- BEGIN GENERATED: {name} -->\n).*?(<!-- END GENERATED: {name} -->)",
        re.S,
    )
    if not pat.search(text):
        print(f"  {path.name}: no block '{name}' — skipped")
        return
    path.write_text(pat.sub(rf"\g<1>{body}\g<2>", text))
    print(f"  {path.name}: block '{name}' regenerated")


def pick_bench(explicit):
    """Pick the newest-ROUND capture; within a round the DRIVER artifact
    (`BENCH_rNN.json`, no suffix) beats local ones (round-3 review weak
    #4: one canonical artifact per metric, driver wins — but a local
    capture of NEWER code beats a stale driver capture of older code)."""
    if explicit:
        return explicit

    def key(p):
        name = Path(p).name
        m = re.match(r"BENCH_r(\d+)", name)
        rnd = int(m.group(1)) if m else -1
        is_driver = 1 if re.fullmatch(r"BENCH_r\d+\.json", name) else 0
        return (rnd, is_driver)

    paths = glob.glob(str(ROOT / "BENCH_r*.json"))
    return max(paths, key=key)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bench", default=None)
    args = ap.parse_args()
    bench_path = pick_bench(args.bench)
    blob = json.load(open(bench_path))
    rows = blob.get("parsed", blob) if isinstance(blob, dict) else blob
    if rows is None and isinstance(blob.get("tail"), str):
        # driver blobs may truncate the bench JSON line from the FRONT
        # (tail capture); recover every complete "key": number pair and
        # backfill anything cut off from the newest local artifact
        pairs = dict(
            (m.group(1), float(m.group(2)))
            for m in re.finditer(
                r'"([A-Za-z0-9_]+)":\s*(-?[0-9][0-9.eE+-]*)', blob["tail"])
        )
        local = sorted(
            p for p in glob.glob(str(ROOT / "BENCH_r*_local.json"))
        )
        base = {}
        if local:
            lb = json.load(open(local[-1]))
            lrows = lb.get("parsed", lb)
            base = dict(lrows.get("extra", lrows))
        rows = {"extra": {**base, **pairs}}
    if rows is None:
        raise SystemExit(f"no parsed bench payload in {bench_path}")
    extra = rows.get("extra", rows)
    inter_path = sorted(glob.glob(str(ROOT / "INTERACTIVE_r*.json")))[-1]
    inter = json.load(open(inter_path))
    # interactive rows: the driver bench capture carries interactive_* keys
    # since round 3 — those are canonical FOR THE SAME ROUND; a newer local
    # INTERACTIVE artifact (new code, driver not yet run) wins over a stale
    # driver capture from a previous round
    def _round(p):
        m = re.search(r"_r(\d+)", Path(p).name)
        return int(m.group(1)) if m else -1

    driver_inter = {
        k[len("interactive_"):]: v
        for k, v in extra.items() if k.startswith("interactive_")
    }
    bench_is_driver = re.fullmatch(r"BENCH_r\d+\.json",
                                   Path(bench_path).name) is not None
    if _round(bench_path) > _round(inter_path) or (
        _round(bench_path) == _round(inter_path) and bench_is_driver
    ):
        inter["rows"] = {**inter.get("rows", {}), **driver_inter}
    else:
        # same-round LOCAL bench (or older): the standalone INTERACTIVE
        # artifact is at least as fresh — its rows win
        inter["rows"] = {**driver_inter, **inter.get("rows", {})}

    src = Path(bench_path).name

    # ---- README headline table ------------------------------------------
    lines = [
        f"| Benchmark | Reference (CPU) | similari_tpu (1 x v5e) | Speedup |",
        f"|---|---|---|---|",
    ]
    special = {
        "visual_sort_100x512_pallas": (
            "VisualSORT 100 obj x 512-d (fused Pallas kernel)", 173, "FPS"),
        "batch_sort_1024x100": (
            "Batch 1024 scenes x 100 obj (SORT IoU)", 618, "scene-frames/s"),
        "batch_visual_256x100x512": (
            "Batch VisualSORT 256 x 100 x 512-d (bf16)", 173,
            "scene-frames/s"),
    }
    for key in HEADLINE:
        label, ref, unit = special.get(key) or REF[key]
        v = extra.get(f"{key}_fps")
        if v is None:
            continue
        lines.append(
            f"| {label} | {ref:,} FPS | {fmt(v)} {unit} | {v / ref:.0f}x |")
    it = inter["rows"]
    lines.append(
        f"| Interactive per-call `Sort.predict` (host engine), 100 / 1000 objects "
        f"| 1.66 / 53.1 ms | {it['sort_100_ms']} / {it['sort_1000_ms']} ms "
        f"| {1.66 / it['sort_100_ms']:.0f}x / {53.098 / it['sort_1000_ms']:.0f}x |")
    body = "\n".join(lines) + f"\n\n(numbers from `{src}` + `{Path(inter_path).name}`; ±15% tunnel variance, ARCHITECTURE.md §6)\n"
    replace_block(ROOT / "README.md", "headline", body)

    # ---- PARITY full matrix ----------------------------------------------
    lines = [
        "| Reference benchmark row | reference | similari_tpu | x |",
        "|---|---|---|---|",
    ]
    for key, (label, ref, unit) in REF.items():
        v = extra.get(f"{key}_fps")
        cell = f"{fmt(v)} {unit}" if v is not None else "N/A (not captured)"
        mult = f"{v / ref:.1f}x" if v is not None else "—"
        lines.append(f"| {label} | {ref:,} | {cell} | {mult} |")
    # host-engine rows from the interactive artifact
    for n in (10, 100, 200, 300, 500, 1000):
        k = f"sort_{n}_ms"
        if k in it:
            ref_ms = inter["reference_ms"][str(n)]
            lines.append(
                f"| Python per-call `Sort.predict`, {n} objects | {ref_ms} ms "
                f"| {it[k]} ms | {ref_ms / it[k]:.1f}x |")
    for n in (10, 100, 500):
        k = f"feature_{n}_ms"
        if k in it:
            refs = {10: 0.101465, 100: 4.020673, 500: 61.716729}
            lines.append(
                f"| Feature engine (256-d, gallery 3), {n} objects | "
                f"{refs[n]:.3f} ms | {it[k]} ms | {refs[n] / it[k]:.1f}x |")
    for n in (10, 100, 500):
        k = f"sort_oriented_{n}_ms"
        if k in it:
            refs = {10: 0.108414, 100: 1.601062, 500: 18.945655}
            lines.append(
                f"| Oriented SORT per-call (host f32 clip), {n} objects | "
                f"{refs[n]:.3f} ms | {it[k]} ms | {refs[n] / it[k]:.1f}x |")
    for n in (10, 50, 100):
        k = f"visual_{n}_ms"
        if k in it:
            refs = {10: 0.447903, 50: 2.249694, 100: 5.775469}
            lines.append(
                f"| VisualSORT per-call (512-d), {n} objects | "
                f"{refs[n]:.3f} ms | {it[k]} ms (host engine, "
                f"predict_arrays) | {refs[n] / it[k]:.1f}x |")
    for n in (10, 100, 500):
        k = f"batch_sort_{n}_ms"
        if k in it:
            refs = {10: 0.106876, 100: 1.616542, 500: 20.454230}
            lines.append(
                f"| BatchSORT per-call (1 scene x {n}, IoU) | "
                f"{refs[n]:.3f} ms | {it[k]} ms (host batch engine) "
                f"| {refs[n] / it[k]:.1f}x |")
    for n in (10, 100, 500):
        k = f"batch_sort_maha_{n}_ms"
        if k in it:
            refs = {10: 0.114592, 100: 1.533445, 500: 18.270742}
            lines.append(
                f"| BatchSORT per-call (1 scene x {n}, Maha) | "
                f"{refs[n]:.3f} ms | {it[k]} ms (host batch engine) "
                f"| {refs[n] / it[k]:.1f}x |")
    # reference bench files with no published numbers: record OUR numbers so
    # the matrix covers every benches/*.rs workload (round-4 VERDICT item 7)
    unpub = "bench exists, no published number"
    for vec_len, count in ((128, 1000), (128, 10000), (512, 1000),
                           (512, 10000)):
        k = f"store_search_{vec_len}_{count}_ms"
        ka = f"store_search_{vec_len}_{count}_arrays_ms"
        if k in it:
            arr = f" / {it[ka]} ms arrays API" if ka in it else ""
            lines.append(
                f"| Store search {vec_len}-d x {count} tracks "
                f"(benches/simple_search.rs) | {unpub} | {it[k]} ms records"
                f"{arr} | — |")
    if "track_search_256_30_100_ms" in it:
        arr = (f" / {it['track_search_256_30_100_arrays_ms']} ms arrays API"
               if "track_search_256_30_100_arrays_ms" in it else "")
        lines.append(
            f"| Track search 256-d x 30 obs x 100 tracks "
            f"(benches/track_search.rs) | {unpub} | "
            f"{it['track_search_256_30_100_ms']} ms records{arr} | — |")
    if "kalman_bbox_100k_ms" in it:
        lines.append(
            f"| Kalman bbox 100k predict/update (benches/kalman_bbox.rs) | "
            f"{unpub} | {it['kalman_bbox_100k_ms']} ms per-call API / "
            f"{it.get('kalman_bbox_100k_bulk_ms', '—')} ms bulk "
            f"filter_sequence | — |")
    if "kalman_point_100k_ms" in it:
        lines.append(
            f"| Kalman 2D point 100k (benches/kalman_2d_point.rs) | {unpub} "
            f"| {it['kalman_point_100k_ms']} ms per-call API / "
            f"{it.get('kalman_point_100k_bulk_ms', '—')} ms bulk "
            f"filter_sequence | — |")
    if "own_areas_100_ms" in it:
        oa = ", ".join(f"{n}: {it[f'own_areas_{n}_ms']} ms"
                       for n in (10, 25, 50, 100))
        lines.append(
            f"| Own-area shares (benches/bbox_own_areas.rs) | {unpub} | "
            f"device kernel {oa} per frame | — |")
    lines.append(
        "| MOT20-01 kit throughput (29.4 dets/frame) | 1,166 FPS | "
        "device pipeline ~20k FPS at that shape (bench sort_iou_100 class); "
        "real MOT17/20 blocked by zero-egress env | — |")
    body = "\n".join(lines) + f"\n\n(generated from `{src}` + `{Path(inter_path).name}` by tools/gen_doc_tables.py)\n"
    replace_block(ROOT / "PARITY.md", "full-matrix", body)

    # ---- adversarial accuracy deltas -------------------------------------
    adv = sorted(glob.glob(str(ROOT / "ADVERSARIAL_r*.json")))
    if adv:
        blob = json.load(open(adv[-1]))
        body = (
            blob["table_md"]
            + f"\n\nWorst |delta| across non-baseline axes: "
            f"**{blob['worst_abs_delta_pt']} pt** (parity bar "
            f"{blob['parity_bar_pt']} pt; seeds {blob['seeds']}; from "
            f"`{Path(adv[-1]).name}`, tools/adversarial_suite.py)\n"
        )
        replace_block(ROOT / "PARITY.md", "adversarial", body)

    # ---- ARCHITECTURE §4 speed-of-light table ----------------------------
    # (round-5 VERDICT item 2: the hand-maintained copy drifted; every row
    # now comes from the same canonical artifact as README/PARITY)
    SOL = [
        ("sort_iou_10", "SORT IoU 10 obj", "per-step dispatch floor"),
        ("sort_iou_100", "SORT IoU 100 obj",
         "auction rounds + per-step overhead"),
        ("sort_iou_100_pallas", "SORT IoU 100 obj, fused Pallas",
         "VMEM-resident whole step (§5)"),
        ("sort_maha_100", "SORT Maha 100", "same as IoU"),
        ("sort_iou_oriented_100", "SORT IoU oriented 100",
         "Green's-theorem clip (§3)"),
        ("sort_maha_oriented_100", "SORT Maha oriented 100",
         "(clip only gates, never scores)"),
        ("sort_iou_500", "SORT IoU 500 obj", "auction on [500, 2500]"),
        ("sort_iou_oriented_500", "SORT IoU oriented 500",
         "x-sorted block-skip clip (§4d, round 4)"),
        ("batch_sort_1024x100", "Batch SORT 1024x100",
         "merge + glue (§4c)"),
        ("visual_sort_100x128", "VisualSORT 100x128-d",
         "cascade + per-step floor"),
        ("visual_sort_100x512", "VisualSORT 100x512-d", "same"),
        ("visual_sort_100x512_pallas", "VisualSORT 100x512-d fused Pallas",
         "VMEM-resident whole step (§5)"),
        ("visual_sort_100x2048", "VisualSORT 100x2048-d",
         "gallery matmul starts to bite"),
        ("batch_visual_256x100x512", "Batch VisualSORT 256x100x512-d (bf16)",
         "see §4c breakdown"),
        ("batch_visual_1024x100x512", "Batch VisualSORT 1024x100x512-d",
         "HBM locality past the knee (§4c)"),
        ("nms_100", "NMS 100 boxes", "fixpoint rounds; aligned kernel"),
        ("nms_500", "NMS 500 boxes", "fixpoint rounds; aligned kernel"),
        ("nms_1000", "NMS 1000 boxes", "fixpoint rounds; aligned kernel"),
        ("nms_10", "NMS 10 boxes (host engine)", "native scalar loop (§4b)"),
        ("nms_oriented_100", "NMS oriented 100", "clip at N²"),
        ("nms_oriented_500", "NMS oriented 500",
         "clip at N²; block-skip ≥512 boxes (§4d)"),
        ("nms_oriented_1000", "NMS oriented 1000",
         "clip at N²; block-skip ≥512 boxes (§4d)"),
    ]
    sol_special_refs = {
        "sort_iou_100_pallas": 561, "batch_sort_1024x100": 618,
        "batch_visual_256x100x512": 173, "batch_visual_1024x100x512": 173,
        "visual_sort_100x512_pallas": 173,
    }
    lines = ["| Workload | Throughput | vs ref | Bound by |",
             "|---|---|---|---|"]
    for key, label, bound in SOL:
        v = extra.get(f"{key}_fps")
        if v is None:
            continue
        ref = sol_special_refs.get(key) or REF[key][1]
        unit = ("scene-frames/s" if key.startswith("batch") else
                "frames/s" if key.startswith("nms") else "FPS")
        lines.append(f"| {label} | {fmt(v)} {unit} | x{v / ref:.0f} | "
                     f"{bound} |")
    body = "\n".join(lines) + (
        f"\n\n(from `{src}`; batch rows are per-chip scene-frames/s against "
        "the reference's single-stream FPS)\n")
    replace_block(ROOT / "ARCHITECTURE.md", "sol", body)

    # ---- ARCHITECTURE §4b interactive SORT table -------------------------
    ABEWLEY = {10: 1.59, 100: 11.98, 200: 25.16, 300: 40.92, 500: 74.25,
               1000: 162.0}
    lines = [
        "| Objects | similari_tpu host engine | reference (i5-7440HQ) | x |"
        " abewley/sort |",
        "|---|---|---|---|---|",
    ]
    for n in (10, 100, 200, 300, 500, 1000):
        k = f"sort_{n}_ms"
        if k not in it:
            continue
        ref_ms = inter["reference_ms"][str(n)]
        lines.append(
            f"| {n} | **{it[k]} ms** | {ref_ms} ms | x{ref_ms / it[k]:.0f} |"
            f" {ABEWLEY[n]} ms |")
    body = "\n".join(lines) + (
        f"\n\n(from `{Path(inter_path).name}`"
        + (f" + `{src}` interactive keys" if driver_inter else "") + ")\n")
    replace_block(ROOT / "ARCHITECTURE.md", "interactive-sort", body)

    # ---- README per-call family ranges (prose fragment) ------------------
    vr = inter.get("vs_reference", {})

    def fam_range(pat):
        vals = [v for k, v in vr.items() if re.match(pat, k)]
        if not vals:
            return "×?"
        def one(v):
            return f"{v:.1f}".rstrip("0").rstrip(".") if v < 10 else f"{v:.0f}"
        return f"×{one(min(vals))}–×{one(max(vals))}"

    body = (
        f"SORT {fam_range(r'sort_\d+_x_reference')}, "
        f"oriented SORT {fam_range(r'sort_oriented_')}, "
        f"VisualSORT {fam_range(r'visual_')}, "
        f"BatchSORT {fam_range(r'batch_sort_')}, "
        f"feature engine {fam_range(r'feature_')}\n")
    replace_block(ROOT / "README.md", "interactive-ranges", body)

    # ---- decision margins (why the adversarial deltas are 0.00) ----------
    mar = sorted(glob.glob(str(ROOT / "MARGINS_r*.json")))
    if mar:
        blob = json.load(open(mar[-1]))
        body = (
            blob["table_md"]
            + f"\n\n{blob['note']} (from `{Path(mar[-1]).name}`, "
            f"tools/decision_margins.py)\n"
        )
        replace_block(ROOT / "PARITY.md", "margins", body)


if __name__ == "__main__":
    sys.exit(main())
