"""System-tier smoke test: the full example graph end-to-end.

Parity: nvblox_test/test/* launches the complete example launch file
against a recorded bag and asserts mesh + slice arrive (SURVEY.md §4
"System tests"). Here: run examples/run_pipeline.py's main() with the
layered YAML config against the synthetic source and assert every output
artifact exists and the bus published on all graph edges.
"""

import runpy
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def test_example_pipeline_full_graph(tmp_path, capsys, monkeypatch):
    monkeypatch.setattr(sys, "argv", [
        "run_pipeline.py",
        "--config", str(REPO / "examples/config/nvblox/nvblox_base.yaml"),
        "--frames", "2", "--out", str(tmp_path),
    ])
    runpy.run_path(str(REPO / "examples/run_pipeline.py"),
                   run_name="__main__")
    out = capsys.readouterr().out
    assert "blocks:" in out
    # All graph edges fired (mesh -> adapter, slice -> costmap).
    assert "'mesh': " in out and "costmap has data: True" in out
    for artifact in ("mesh.ply", "tsdf.ply", "esdf.ply", "map.png",
                     "map.yaml", "mesh.html"):
        p = tmp_path / artifact
        assert p.exists() and p.stat().st_size > 0, artifact
