"""Regenerate README.md's measured-performance table from BENCH artifacts.

The README's perf rows are GENERATED — never hand-edited — so the front
page cannot drift from the driver-captured numbers again (round-3 verdict
weak #6: the README showed round-2 numbers that matched no artifact).

Usage:
    python tools/gen_readme_perf.py

Uses the highest-numbered BENCH_r*.json in the repo root — the driver's
artifact of record, nothing else. Round-4 verdict weak #1: the README was
generated from a flattering uncommitted `bench_latest.json` side file
(node tick 4.04 ms where BENCH_r04.json said 13.135). The generator now
REFUSES arbitrary sources: only committed `BENCH_r*.json` files are
accepted, and `tests/test_readme_provenance.py` asserts the README block
matches the newest one byte-for-byte. Rewrites the block between the
README markers `<!-- BENCH_TABLE_BEGIN -->` and `<!-- BENCH_TABLE_END -->`.
"""
import json
import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

REF = {  # BASELINE.md, Replica @ RTX 3090 (per-frame CUDA-event times)
    "tsdf_ms": 0.5, "color_ms": 0.7, "mesh_ms": 0.7, "esdf_ms": 0.8,
    "dynamics_ms": 1.7,
}


def load_bench():
    if len(sys.argv) > 1:
        raise SystemExit(
            "gen_readme_perf.py takes no arguments: the README perf table "
            "is generated ONLY from the newest committed BENCH_r*.json "
            "(driver artifact of record). Local bench output is not an "
            "acceptable source — see round-4 VERDICT weak #1.")
    benches = sorted(REPO.glob("BENCH_r*.json"))
    if not benches:
        raise SystemExit("no BENCH_r*.json found")
    path = benches[-1]
    tracked = subprocess.run(
        ["git", "-C", str(REPO), "ls-files", "--error-unmatch", path.name],
        capture_output=True).returncode == 0
    if not tracked:
        raise SystemExit(f"{path.name} is not committed — refusing "
                         "(README must reflect the artifact of record)")
    data = json.loads(path.read_text())
    return data.get("parsed", data), path.name


def fmt(v, nd=2):
    return f"{v:.{nd}f}" if isinstance(v, (int, float)) else str(v)


def build_table(b, src):
    blocks = b.get("allocated_blocks", "?")
    blocks_big = b.get("allocated_blocks_large_scene", "?")
    rows = [
        ("TSDF integrate", "tsdf_ms", REF["tsdf_ms"]),
        ("Color integrate", "color_ms", REF["color_ms"]),
        ("Meshing (incremental, per-vertex color)", "mesh_ms",
         REF["mesh_ms"]),
        ("ESDF (exact banded EDT, full region)", "esdf_ms", REF["esdf_ms"]),
        ("ESDF (online incremental window)", "esdf_incremental_ms", None),
        ("Dynamics (detect + masked split + freespace)", "dynamics_ms",
         REF["dynamics_ms"]),
    ]
    lines = [
        "<!-- BENCH_TABLE_BEGIN -->",
        f"Generated from `{src}` by `tools/gen_readme_perf.py` — do not",
        "hand-edit. Scene: synthetic Replica-office-scale room, VGA depth,",
        f"0.05 m voxels, {blocks} allocated blocks (large-scene variant:",
        f"{blocks_big} blocks). Reference column: BASELINE.md Replica @",
        "RTX 3090 (per-frame CUDA-event kernel times).",
        "",
        "| stage | ms/frame (v5e chip) | RTX 3090 | ratio |",
        "|---|---|---|---|",
    ]
    for label, key, ref in rows:
        v = b.get(key)
        if v is None:
            continue
        ratio = f"{v / ref:.2f}x" if ref else "—"
        lines.append(f"| {label} | **{fmt(v, 3)}** | "
                     f"{fmt(ref, 1) if ref else '—'} | {ratio} |")
    lines += [
        "",
        f"Headline: **{fmt(b.get('value'))} fps** TSDF+ESDF/chip "
        f"(vs_baseline {fmt(b.get('vs_baseline'), 3)}); pipeline at the "
        f"reference cadences {fmt(b.get('pipeline_fps_at_ref_cadence'))} "
        "fps; node tick "
        f"{fmt(b.get('node_tick_ms'))} ms wall incl. relay dispatch; "
        f"large scene ({blocks_big} blocks) TSDF "
        f"{fmt(b.get('tsdf_ms_large_scene'), 3)} ms / ESDF "
        f"{fmt(b.get('esdf_ms_large_scene'), 3)} ms. Accuracy: TSDF MAE "
        f"{fmt(b.get('tsdf_mae_m'), 4)} m, ESDF MAE "
        f"{fmt(b.get('esdf_mae_m'), 4)} m vs the analytic scene SDF.",
    ]
    if "relay_floor_ms" in b:
        lines += [
            "",
            f"Methodology: absolute times subtract the measured "
            f"{fmt(b['relay_floor_ms'], 3)} ms/step relay dispatch floor "
            "(an empty 64-step scan through the tunneled TPU; the "
            "reference's CUDA-event times carry zero dispatch overhead); "
            "component times are cadence differences of two replays, "
            "where the floor cancels. See bench.py docstrings.",
        ]
    lines.append("<!-- BENCH_TABLE_END -->")
    return "\n".join(lines)


def main():
    b, src = load_bench()
    readme = (REPO / "README.md").read_text()
    table = build_table(b, src)
    pattern = re.compile(r"<!-- BENCH_TABLE_BEGIN -->.*?"
                         r"<!-- BENCH_TABLE_END -->", re.S)
    if pattern.search(readme):
        readme = pattern.sub(lambda _: table, readme)
    else:
        raise SystemExit("README markers not found")
    (REPO / "README.md").write_text(readme)
    print(f"README perf table regenerated from {src}")


if __name__ == "__main__":
    main()
