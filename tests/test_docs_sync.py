"""Doc-vs-capture staleness guard (VERDICT r3 weak #1 / next #6).

Round 3 shipped a README and PARITY.md quoting 1.94e9 voxels/s and
283 ms/mesh while the driver capture recorded 2.69e9 / 199 ms — stale
top-level inventory docs are exactly how a future round mis-baselines
itself. This test greps the README perf table and PARITY's perf
paragraph against bench_details.json so the next drift fails loudly.

Tolerances are wide (35%) on purpose: bench_details.json is rewritten
by every `python bench.py` run and short-program relay lines vary
±10-20% (CLAUDE.md); the guard catches order-of-version drift (a 35%+
move means the docs describe a different build), not run noise.
"""

import json
import pathlib
import re

import pytest

ROOT = pathlib.Path(__file__).resolve().parents[1]


def _details():
    p = ROOT / "bench_details.json"
    if not p.exists():
        pytest.skip("no bench_details.json in this checkout")
    return json.loads(p.read_text())


def _first_number(pattern: str, text: str, doc: str) -> float:
    m = re.search(pattern, text)
    assert m, f"{doc}: pattern {pattern!r} not found — table reshaped? " \
              f"update tests/test_docs_sync.py alongside"
    return float(m.group(1))


def _close(doc_val: float, cap_val: float, what: str, tol: float = 0.35):
    assert abs(doc_val - cap_val) <= tol * cap_val, (
        f"{what}: doc quotes {doc_val:.3g} but bench_details.json has "
        f"{cap_val:.3g} — stale doc (or stale capture: rerun bench.py "
        f"then update the doc)")


def test_readme_perf_table_matches_bench_details():
    d = _details()
    txt = (ROOT / "README.md").read_text()
    v512 = _first_number(
        r"512\^3, three-level hierarchical\) \| \*\*([0-9.]+)e9\*\*",
        txt, "README") * 1e9
    _close(v512, d["hier3_512_effective_voxels_per_sec"], "README 512^3")
    serve_ms = _first_number(r"\*\*([0-9.]+) ms/mesh\*\*", txt, "README")
    # serve is host-mesh-dominated on the shared 1-core host and swings
    # ~2x run-to-run (158-300 ms observed); 0.5 here is variance head-
    # room, not doc laxity — device-side keys keep the 0.35 default.
    _close(serve_ms, 1000.0 / d["serve_256_meshes_per_sec"],
           "README serve ms/mesh", tol=0.5)


def test_baseline_het64_row_matches_bench_details():
    # VERDICT r4 #6/#7: the config-4 heterogeneous ceiling analysis must
    # quote the hardware capture, and the capture must carry provenance
    # keys for both carriers so a silent substitution shows in the diff.
    d = _details()
    if "hier3_flat64het_256_effective_voxels_per_sec" not in d:
        pytest.skip("capture predates the het64 phase")
    txt = (ROOT / "BASELINE.md").read_text()
    flat = _first_number(r"flat-compacted ([0-9.]+)e8", txt,
                         "BASELINE") * 1e8
    _close(flat, d["hier3_flat64het_256_effective_voxels_per_sec"],
           "BASELINE het64 flat")
    vmap = _first_number(r"vmapped ([0-9.]+)e8", txt, "BASELINE") * 1e8
    _close(vmap, d["hier3_vmap64het_256_effective_voxels_per_sec"],
           "BASELINE het64 vmap")
    imb = _first_number(r"= \*\*([0-9.]+)× imbalance\*\*", txt,
                        "BASELINE")
    _close(imb, d["hier3_het64_active_l3_max"]
           / d["hier3_het64_active_l3_mean"], "BASELINE het64 imbalance",
           tol=0.05)


def test_parity_perf_paragraph_matches_bench_details():
    d = _details()
    txt = (ROOT / "PARITY.md").read_text()
    v512 = _first_number(r"512³\s*\n?\*\*([0-9.]+)e9\*\*", txt,
                         "PARITY") * 1e9
    _close(v512, d["hier3_512_effective_voxels_per_sec"], "PARITY 512^3")
    serve_ms = _first_number(r"\*\*([0-9.]+) ms/mesh\*\*", txt, "PARITY")
    # same host-variance headroom as the README serve check above
    _close(serve_ms, 1000.0 / d["serve_256_meshes_per_sec"],
           "PARITY serve ms/mesh", tol=0.5)
