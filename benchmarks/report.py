"""Render the docs/PERFORMANCE.md results table from benchmarks/results.json.

One source of truth: the suite writes results.json; this script rewrites the
region of docs/PERFORMANCE.md between the GENERATED markers from it (plus
BENCH_r*.json headline lines when present), so the prose can never drift
from the measured artifacts again.

The generated block records a manifest of the artifacts (name + content
hash) it was rendered from.  `--check` validates the doc against exactly
those artifacts: a table is stale when a manifested file changed or
disappeared, NOT when a new driver BENCH_r*.json merely appears in the tree
(the round-2 failure mode: every driver round dropped a new headline file
and broke the committed check).  A plain regenerate picks up new artifacts
and refreshes the manifest.

Run:  python benchmarks/report.py [--check]
--check exits non-zero if the doc is stale instead of rewriting it.
"""

from __future__ import annotations

import argparse
import glob
import hashlib
import json
import os
import re
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
DOC = os.path.join(REPO, "docs", "PERFORMANCE.md")
BEGIN = "<!-- BEGIN GENERATED RESULTS (benchmarks/report.py) -->"
END = "<!-- END GENERATED RESULTS -->"
MANIFEST_RE = re.compile(r"<!-- sources: (.*?) -->")


def _short_hash(path: str) -> str:
    with open(path, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()[:12]


def _manifest_line(paths) -> str:
    entries = " ".join(
        f"{os.path.basename(p)}@{_short_hash(p)}" for p in paths
    )
    return f"<!-- sources: {entries} -->"

_LABELS = {
    "cpu_parity_720p": "720p `--cpu` parity flow (full map/frame)",
    "fused_720p_80px": "720p fused, 80x80 template",
    "batch_4_720p": "720p batch (`--batch=4`)",
    "batch_8_720p": "720p batch (`--batch=8`)",
    "batch_16_720p": "720p batch (`--batch=16`)",
    "batch_32_720p": "720p batch (`--batch=32`)",
    "1080p_r160": "1080p, radius 160",
    "4k_r160": "4K, radius 160",
    "1080p_r160_fast": "1080p, radius 160 (fast tier)",
    "1080p_t160_r160": "1080p, 160x160 template, radius 160",
    "1080p_t160_r160_fast":
        "1080p, 160x160 template, radius 160 (fast tier)",
    "4k_r160_fast": "4K, radius 160 (fast tier)",
    "pallas_720p_80px": "720p Pallas kernel (`--shared/--const/--const_tiled`)",
    "mode_cpu_720p": "mode `--cpu` (TM_CCOEFF_NORMED full map)",
    "mode_cuda_720p": "mode `--cuda`/naive (MXU matmul engine, HIGHEST)",
    "mode_fast_720p": "mode `--fast` (matmul engine, precision=HIGH)",
    "mode_shared_720p": "mode `--shared/--const/--const_tiled` (Pallas)",
    "mega_720p": "720p mega-kernel (`--mega` suite row)",
    "hetero_serving_720p_1080p":
        "mixed-geometry serving (8x720p/80px + 4x1080p/64px, grouped mega)",
    "hetero_serving_720p_1080p_batch4":
        "mixed-geometry serving x batch 4 (grouped mega, look-ahead cadence)",
}


def _label(rec):
    cfg = rec["config"]
    if cfg in _LABELS:
        return _LABELS[cfg]
    m = re.match(r"multi_object_(\d+)x_720p", cfg)
    if m:
        engine = rec.get("backend")
        if engine in ("mega", "mega_fast"):
            return f"{m.group(1)} objects / frame ({engine} kernel)"
        return f"{m.group(1)} objects / frame (vmap)"
    m = re.match(r"multi_stream_(\d+)x_batch(\d+)_720p", cfg)
    if m:
        be = rec.get("backend")
        grid = (
            "mega grid" if be == "mega"
            else "mega grid, fast tier" if be == "mega_fast"
            else f"{be or 'scan'} lockstep scan"
        )
        return f"{m.group(1)} streams x batch {m.group(2)} ({grid})"
    m = re.match(r"occl_serving_(\d+)x_p(\d+)_(\w+)", cfg)
    if m:
        return (
            f"{m.group(1)}-stream occlusion serving "
            f"(period {m.group(2)}, {m.group(3)}, "
            f"{rec.get('backend', '?')} engine)"
        )
    if cfg == "headline_median_720p":
        return "720p headline (median of fresh processes)"
    m = re.match(r"occl_(\w+)_720p", cfg)
    if m:
        what = (
            "clean clip" if m.group(1) == "clean"
            else f"occlusion every {m.group(1)[1:]} frames"
        )
        return f"720p occlusion regime ({what}, mega driver)"
    m = re.match(r"multi_stream_(\d+)x_(\d+)p", cfg)
    if m:
        engine = rec.get("backend")
        suffix = f", {engine} engine" if engine else ""
        res = "" if m.group(2) == "720" else f" {m.group(2)}p"
        return f"{m.group(1)} independent{res} streams (serving{suffix})"
    m = re.match(r"serving_e2e_(\d+)x_720p", cfg)
    if m:
        engine = rec.get("backend")
        suffix = f", {engine} engine" if engine else ""
        return (
            f"{m.group(1)} live streams END-TO-END "
            f"(`pvot.serve_streams`: decode+upload+track+fetch timed"
            f"{suffix})"
        )
    return cfg


def _fmt_fps(v):
    return f"{v:,.0f}"


def render(bench_files=None) -> str:
    """Render the generated block.  bench_files pins the BENCH_r*.json
    headline sources (used by --check to render from the doc's recorded
    manifest); None globs the tree (a fresh regenerate)."""
    results_path = os.path.join(HERE, "results.json")
    with open(results_path) as f:
        results = json.load(f)
    meta = next((r["_meta"] for r in results if "_meta" in r), "")
    results = [r for r in results if "_meta" not in r]

    if bench_files is None:
        headlines = sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json")))
    else:
        headlines = [os.path.join(REPO, os.path.basename(p)) for p in bench_files]
    lines = [BEGIN, _manifest_line([results_path] + headlines), ""]
    for p in headlines:
        try:
            with open(p) as f:
                rec = json.load(f)
            inner = rec.get("parsed") or rec
            if isinstance(inner, dict) and "value" in inner:
                lines.append(
                    f"Driver headline ({os.path.basename(p)}): "
                    f"**{_fmt_fps(inner['value'])} {inner.get('unit', '')}**, "
                    f"{inner.get('vs_baseline', '?')}x baseline."
                )
        except Exception:
            continue
    if len(lines) > 3:
        lines.append("")

    lines.append("| Config | FPS | vs reference | Notes |")
    lines.append("|---|---:|---:|---|")
    for rec in results:
        if "value" not in rec:  # skipped/error records carry no measurement
            continue
        notes = []
        if "max_l1_err_px" in rec:
            notes.append(f"{rec['max_l1_err_px']} px trajectory error")
        if "object_rate" in rec:
            notes.append(f"{_fmt_fps(rec['object_rate'])} object-updates/s")
        if "aggregate_fps" in rec:
            notes.append(f"**{_fmt_fps(rec['aggregate_fps'])} aggregate FPS**")
        if "engine" in rec:
            notes.append(f"{rec['engine']} kernel")
        if "parity_max_abs_err_vs_matmul" in rec:
            notes.append(
                f"on-device parity vs matmul engine: "
                f"{rec['parity_max_abs_err_vs_matmul']:.1e} max abs err"
            )
        if "mfu_f32_highest_pct" in rec:
            notes.append(
                f"{rec['achieved_tflops']} TFLOP/s = "
                f"{rec['mfu_f32_highest_pct']}% of f32-HIGHEST peak"
            )
        if "batch" in rec.get("config", "") and "batch_" in rec["config"]:
            notes.append("parity semantics (one update/batch)")
        if "runs" in rec and "min" in rec and "max" in rec:
            notes.append(
                f"median of {len(rec['runs'])} fresh processes, range "
                f"{_fmt_fps(rec['min'])}–{_fmt_fps(rec['max'])}"
            )
        if "scan_fps" in rec:
            notes.append(
                f"scan engine same process: {_fmt_fps(rec['scan_fps'])} FPS; "
                f"{rec.get('global_frames', 0)} global-search frames; "
                "trajectories asserted equal"
            )
        if "relay_note" in rec:
            notes.append(rec["relay_note"])
        lines.append(
            f"| {_label(rec)} | {_fmt_fps(rec['value'])} | "
            f"{rec['vs_baseline']}x | {'; '.join(notes)} |"
        )
    lines.append("")
    if meta:
        lines.append(f"_{meta}_")
        lines.append("")
    lines.append(END)
    return "\n".join(lines)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()
    with open(DOC) as f:
        doc = f.read()
    if BEGIN not in doc or END not in doc:
        print(f"markers missing in {DOC}", file=sys.stderr)
        return 1
    if args.check:
        # Pin the check to the artifacts the committed table was generated
        # from (the doc's manifest), so an untracked driver artifact
        # appearing later cannot retroactively break the suite.
        m = MANIFEST_RE.search(doc)
        if not m:
            print("docs/PERFORMANCE.md has no sources manifest; regenerate")
            return 1
        bench_files = []
        for entry in m.group(1).split():
            name, _, want_hash = entry.partition("@")
            path = HERE if name == "results.json" else REPO
            path = os.path.join(path, name)
            if not os.path.exists(path):
                print(f"manifested source {name} is missing; regenerate")
                return 1
            if _short_hash(path) != want_hash:
                print(f"manifested source {name} changed; regenerate")
                return 1
            if name.startswith("BENCH_r"):
                bench_files.append(path)
        block = render(bench_files=bench_files)
        new_doc = re.sub(
            re.escape(BEGIN) + r".*?" + re.escape(END), block, doc, flags=re.S
        )
        if new_doc != doc:
            print("docs/PERFORMANCE.md is stale; run benchmarks/report.py")
            return 1
        print("docs/PERFORMANCE.md is in sync")
        return 0
    block = render()
    new_doc = re.sub(
        re.escape(BEGIN) + r".*?" + re.escape(END), block, doc, flags=re.S
    )
    with open(DOC, "w") as f:
        f.write(new_doc)
    print(f"rewrote generated block in {DOC}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
