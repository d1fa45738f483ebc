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
    """The DRIVER capture (`BENCH_rNN.json`, no suffix) is canonical; local
    captures (`BENCH_rNN_local.json`) are fallbacks only (round-3 review
    weak #4: one canonical artifact per metric, driver wins)."""
    if explicit:
        return explicit
    driver = sorted(
        p for p in glob.glob(str(ROOT / "BENCH_r*.json"))
        if re.fullmatch(r"BENCH_r\d+\.json", Path(p).name)
    )
    if driver:
        return driver[-1]
    return sorted(glob.glob(str(ROOT / "BENCH_r*.json")))[-1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bench", default=None)
    args = ap.parse_args()
    bench_path = pick_bench(args.bench)
    blob = json.load(open(bench_path))
    rows = blob.get("parsed", blob)
    extra = rows.get("extra", rows)
    inter_path = sorted(glob.glob(str(ROOT / "INTERACTIVE_r*.json")))[-1]
    inter = json.load(open(inter_path))
    # interactive rows: the driver bench capture carries interactive_* keys
    # since round 3 — those are canonical; the standalone INTERACTIVE
    # artifact fills anything the driver capture lacks
    driver_inter = {
        k[len("interactive_"):]: v
        for k, v in extra.items() if k.startswith("interactive_")
    }
    inter["rows"] = {**inter.get("rows", {}), **driver_inter}

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
    lines.append(
        "| MOT20-01 kit throughput (29.4 dets/frame) | 1,166 FPS | "
        "device pipeline ~20k FPS at that shape (bench sort_iou_100 class); "
        "real MOT17/20 blocked by zero-egress env | — |")
    body = "\n".join(lines) + f"\n\n(generated from `{src}` + `{Path(inter_path).name}` by tools/gen_doc_tables.py)\n"
    replace_block(ROOT / "PARITY.md", "full-matrix", body)


if __name__ == "__main__":
    sys.exit(main())
