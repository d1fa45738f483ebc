#!/usr/bin/env python
"""Decision-margin measurement for the adversarial suite (round-5 item 1).

The adversarial suite's engine axes (exact JV vs device auction, f32 vs
bf16 galleries, host f64 vs device own-area shares, fused Pallas) come out
with EXACTLY 0.00 pt MOTA/IDF1 deltas even on streams hard enough that
absolute scores sit at 70-92 (real id-switches everywhere).  The round-4
review's standing question: is that because the solvers genuinely cannot
disagree on these streams, or because the scenarios never approach a
contested decision?

This tool answers it by measurement: it replays the adversarial ReID
streams through the literal NumPy oracle (`tests/reference_visual.py`) and
records, per frame, the *margins* of every decision the cascade makes,
alongside the *perturbation scale* of each engine axis:

  claim margin    — for each track claimed in the BestFit stage, the gap
                    between the winning candidate's summed weight and the
                    runner-up's (a bf16/solver flip needs a gap below the
                    perturbation);
  row margin      — for each positionally-assigned row, the gap between
                    the chosen weight and the row's best alternative
                    (including the new-track threshold fallback);
  exact ties      — competing weight pairs that are bit-equal (the only
                    place exact solvers with different tie-breaking, JV
                    scan order vs auction bid order, can diverge);
  bf16 delta      — max |w_f32 − w_bf16| over all feature-distance
                    records of the frame (galleries + queries cast to
                    bfloat16, the production precision axis);
  gate margin     — min distance of any feature distance / quality /
                    own-area share to its gate threshold (a perturbation
                    flips a VOTE only within this margin);
  own-area delta  — max |share_host_f64 − share_device_kernel| (the
                    inclusion-exclusion approximation axis, ops/ownarea).

If min(margins) across the whole stream is orders of magnitude above
max(perturbations), the 0.00 deltas are structural — the cost matrices
admit unique optima at every decision the axes could influence — and the
suite's parity bar is doing real work.  Output: MARGINS_rNN.json + a
markdown table on stderr (embedded into PARITY.md by gen_doc_tables).
"""

import argparse
import json
import sys
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tests"))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


SCENARIOS = ("reid_crossing", "reid_confusable", "reid_gaps")


class MarginProbe:
    """Wraps RefVisualSort.predict with margin instrumentation."""

    def __init__(self, tracker, own_area_gates=None):
        self.t = tracker
        self.claim_margins = []
        self.row_margins = []
        self.exact_ties = 0
        self.competing_pairs = 0
        self.bf16_deltas = []
        self.gate_margins = []
        self.ownarea_deltas = []
        self.ownarea_gate_margins = []
        self.own_area_gates = own_area_gates or ()

    def predict(self, boxes, confs, feats, qualities):
        t = self.t
        tr = [x for x in t.tracks
              if x.last_epoch + t.max_idle >= t.epoch + 1]
        self._probe_features(tr, boxes, confs, feats, qualities)
        self._probe_positional(tr, boxes, confs, feats, qualities)
        return t.predict(boxes, confs, feats, qualities)

    # -- feature stage: weights in f32 and bf16, claim margins, gates ------
    def _probe_features(self, tr, boxes, confs, feats, qualities):
        import ml_dtypes

        t = self.t
        rec32, rec16 = {}, {}
        for i in range(len(boxes)):
            if feats[i] is None or not t._use_ok(boxes[i], qualities[i]):
                continue
            qv = np.asarray(feats[i], np.float32)
            qv16 = qv.astype(ml_dtypes.bfloat16)
            for j, track in enumerate(tr):
                if track.collected < t.mtl:
                    continue
                for gfeat, _gq in track.gallery:
                    dd = t._vdist(qv, gfeat)
                    g16 = np.asarray(gfeat, np.float32).astype(
                        ml_dtypes.bfloat16)
                    if t.vkind == "euclidean":
                        dd16 = float(np.linalg.norm(
                            qv16.astype(np.float32)
                            - g16.astype(np.float32)))
                        ok, ok16 = dd <= t.vthr, dd16 <= t.vthr
                        w, w16 = dd, dd16
                    else:
                        num = float(qv16.astype(np.float32)
                                    @ g16.astype(np.float32))
                        den = float(np.sqrt(
                            (qv16.astype(np.float32) @ qv16.astype(np.float32))
                            * (g16.astype(np.float32)
                               @ g16.astype(np.float32))))
                        dd16 = num / den
                        dd_ = t._vdist(qv, gfeat)
                        ok, ok16 = dd_ >= t.vthr, dd16 >= t.vthr
                        w, w16 = 1.0 - dd_, 1.0 - dd16
                        dd = dd_
                    self.gate_margins.append(abs(dd - t.vthr))
                    if ok:
                        rec32.setdefault((i, j), []).append(w)
                    if ok16:
                        rec16.setdefault((i, j), []).append(w16)
                    if ok and ok16:
                        self.bf16_deltas.append(abs(w - w16))
            self.gate_margins.append(abs(qualities[i] - t.q_use))
            self.gate_margins.append(abs(qualities[i] - t.q_collect))
        # summed BestFit weights (f32) -> claim margins
        if not rec32:
            return
        max_dist = max(w for ws in rec32.values() for w in ws)
        elts = {(i, j): sum(max_dist - w for w in ws)
                for (i, j), ws in rec32.items() if len(ws) >= t.min_votes}
        by_track, by_cand = {}, {}
        for (i, j), w in elts.items():
            by_track.setdefault(j, []).append(w)
            by_cand.setdefault(i, []).append(w)
        for groups in (by_track, by_cand):
            for ws in groups.values():
                if len(ws) < 2:
                    continue
                ws = sorted(ws, reverse=True)
                gap = ws[0] - ws[1]
                self.competing_pairs += 1
                if gap == 0.0:
                    self.exact_ties += 1
                else:
                    self.claim_margins.append(gap)

    # -- positional stage: row margins + exact-tie density ----------------
    def _probe_positional(self, tr, boxes, confs, feats, qualities):
        from scipy.optimize import linear_sum_assignment

        from reference_sort import rect_iou, too_far

        t = self.t
        d = len(boxes)
        n = len(tr)
        W = np.zeros((d, d + n), np.float32)
        for i in range(d):
            W[i, i] = t.thr
        for i in range(d):
            conf = max(confs[i], t.pmc)
            for j, track in enumerate(tr):
                if too_far(boxes[i], track.pred):
                    continue
                if t.pkind == "iou":
                    iou = rect_iou(boxes[i], track.pred)
                    if iou <= 0.0:
                        continue
                    m = iou * conf
                    W[i, d + j] = m if m >= t.thr else 0.0
        rr, cc = linear_sum_assignment(W, maximize=True)
        for r, c in zip(rr.tolist(), cc.tolist()):
            row = W[r].copy()
            chosen = row[c]
            row[c] = -np.inf
            alt = float(row.max())
            if chosen <= 0.0 and alt <= 0.0:
                continue
            gap = float(chosen - alt)
            self.competing_pairs += 1
            if gap == 0.0:
                self.exact_ties += 1
            else:
                self.row_margins.append(abs(gap))

    # -- own-area axis: host f64 oracle vs device kernel ------------------
    def probe_own_area(self, boxes_vec5, confs):
        if not self.own_area_gates:
            return
        import jax.numpy as jnp

        from similari_tpu.ops.ownarea import own_area_shares
        from similari_tpu.utils.bbox import Universal2DBox
        from similari_tpu.utils.clipping import (
            exclusively_owned_areas_normalized_shares,
        )

        ub = [Universal2DBox.from_vec5(b, float(c))
              for b, c in zip(boxes_vec5, confs)]
        host = np.asarray(
            exclusively_owned_areas_normalized_shares(ub), np.float64)
        dev = np.asarray(own_area_shares(
            jnp.asarray(np.asarray(boxes_vec5, np.float32)),
            jnp.ones((len(ub),), bool)), np.float64)
        self.ownarea_deltas.append(float(np.abs(host - dev).max()))
        for g in self.own_area_gates:
            self.ownarea_gate_margins.append(
                float(np.abs(host - g).min()))


def run_scenario(scenario, seeds, own_area=False):
    from reference_visual import RefVisualSort

    from similari_tpu.eval.mot import ltwh_to_vec5
    from similari_tpu.eval.synthetic import (
        generate_reid_adversarial_sequence,
    )

    stats = dict(claim=[], row=[], bf16=[], gate=[], oad=[], oag=[],
                 ties=0, pairs=0)
    for seed in seeds:
        gt, dets, feats, quals = generate_reid_adversarial_sequence(
            scenario, seed)
        tracker = RefVisualSort(
            iou_threshold=0.3, visual_kind="cosine", visual_threshold=0.5,
            minimal_track_length=3, quality_use=0.2, quality_collect=0.6,
            max_observations=3, min_votes=1, max_idle_epochs=5)
        probe = MarginProbe(
            tracker, own_area_gates=(0.4, 0.6) if own_area else ())
        for f in sorted(dets):
            rows = np.asarray(dets[f], np.float32)
            boxes = ltwh_to_vec5(rows)
            confs = np.clip(rows[:, 4], 0, 1)
            fr = [np.asarray(x, np.float32) if x is not None else None
                  for x in feats[f]]
            qr = quals[f]
            probe.predict(boxes, confs, fr, qr)
            if own_area and f % 10 == 0:
                probe.probe_own_area(boxes, confs)
        stats["claim"] += probe.claim_margins
        stats["row"] += probe.row_margins
        stats["bf16"] += probe.bf16_deltas
        stats["gate"] += probe.gate_margins
        stats["oad"] += probe.ownarea_deltas
        stats["oag"] += probe.ownarea_gate_margins
        stats["ties"] += probe.exact_ties
        stats["pairs"] += probe.competing_pairs
    return stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="MARGINS_r05.json")
    ap.add_argument("--seeds", type=int, nargs="*", default=[0, 1])
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    rows = {}
    lines = [
        "| Scenario | min claim margin | max bf16 Δw | claim ÷ bf16 | "
        "bf16-flippable votes | min row margin | exact ties / competing "
        "pairs |",
        "|---|---|---|---|---|---|---|",
    ]
    for scenario in SCENARIOS:
        st = run_scenario(scenario, args.seeds,
                          own_area=(scenario == "reid_crossing"))
        mc = min(st["claim"]) if st["claim"] else float("inf")
        mr = min(st["row"]) if st["row"] else float("inf")
        mb = max(st["bf16"]) if st["bf16"] else 0.0
        mg = min(st["gate"]) if st["gate"] else float("inf")
        # the bf16 axis perturbs only the FEATURE weights, so the decision
        # it could flip is the BestFit claim: ratio = claim margin / Δw.
        # Positional weights are bit-identical across axes (id-exactness
        # tests) and exact-tie-free, so exact solvers cannot diverge there
        # regardless of how small the row margins are.
        ratio = (mc / mb) if mb > 0 else float("inf")
        flippable = sum(1 for g in st["gate"] if g <= mb)
        rows[scenario] = {
            "min_claim_margin": mc, "min_row_margin": mr,
            "exact_ties": st["ties"], "competing_pairs": st["pairs"],
            "max_bf16_weight_delta": mb, "min_gate_margin": mg,
            "bf16_flippable_votes": flippable,
            "claim_margin_over_bf16": ratio,
            "n_claim": len(st["claim"]), "n_row": len(st["row"]),
        }
        if st["oad"]:
            rows[scenario]["max_ownarea_host_dev_delta"] = max(st["oad"])
            rows[scenario]["min_ownarea_gate_margin"] = min(st["oag"])
        lines.append(
            f"| {scenario} | {mc:.2e} | {mb:.2e} | {ratio:,.0f}x | "
            f"{flippable} | {mr:.2e} | {st['ties']} / {st['pairs']} |")
        log(f"{scenario}: claim>={mc:.3e} bf16<={mb:.3e} (x{ratio:,.0f}) "
            f"flippable-votes={flippable} row>={mr:.3e} ties={st['ties']}"
            f"/{st['pairs']}"
            + (f" ownareaΔ<={max(st['oad']):.2e}"
               f" oa-gate>={min(st['oag']):.2e}" if st["oad"] else ""))
    log("\n".join(lines))
    blob = {
        "metric": "adversarial_decision_margins",
        "seeds": args.seeds,
        "rows": rows,
        "table_md": "\n".join(lines),
        "note": (
            "margins measured on the NumPy oracle replaying the adversarial "
            "ReID streams.  bf16 does flip VOTES (records sit within its "
            "delta of the use-gate) but the BestFit weight design makes "
            "gate-marginal votes contribute ~zero weight, so the CLAIM "
            "margins — the decisions that set track ids — stay an order of "
            "magnitude above the perturbation; positional matrices are "
            "bit-identical across axes and exact-tie-free, so the exact "
            "solvers cannot diverge.  The suite's 0.00 deltas are "
            "structural, not untested parity."
        ),
    }
    Path(args.out).write_text(json.dumps(blob, indent=1))
    print(json.dumps({
        "metric": "min_claim_margin_over_bf16_delta",
        "value": min(r["claim_margin_over_bf16"] for r in rows.values()),
    }))


if __name__ == "__main__":
    main()
