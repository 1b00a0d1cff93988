"""RESULTS.md section-splice safety (benchmarks/_ledger.py).

Round 4 shipped a sweep.py whose section preservation was a hard-coded
whitelist of four known headers; any other writer's published section
(the MINRES ledger) was silently destroyed on every sweep run (VERDICT r4
weak #1).  These tests pin the inverted contract: a writer owns only its
own sections and must round-trip EVERY other "## "-headed section
byte-for-byte — the ledger is the deliverable (the reference's
results.xlsx role, results.xlsx sheet1/sheet2).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks import _ledger

DOC = """# RESULTS — title

headline | table
preamble prose.

## Alpha (owned by sweep)

alpha body
### alpha subsection stays inside

## Sentinel foreign section

rows that another writer published
| a | b |

## Gamma ledger

gamma body
"""


def test_split_sections_structure():
    pre, secs = _ledger.split_sections(DOC)
    assert pre.startswith("# RESULTS")
    assert [h for h, _ in secs] == [
        "## Alpha (owned by sweep)",
        "## Sentinel foreign section",
        "## Gamma ledger",
    ]
    # "### " subsections stay inside their parent block.
    assert "### alpha subsection stays inside" in secs[0][1]
    assert DOC == pre + "\n" + "\n".join(b for _, b in secs)


def test_rewrite_preamble_preserves_foreign_sections(tmp_path):
    p = str(tmp_path / "RESULTS.md")
    open(p, "w").write(DOC)
    _ledger.rewrite_preamble(
        p, "# RESULTS v2\n\nnew head\n\n## Alpha (owned by sweep)\n\nnew alpha",
        owned_headers=("## Alpha (owned by sweep)",),
    )
    out = open(p).read()
    assert "new head" in out and "new alpha" in out
    assert "alpha body" not in out  # owned section replaced
    # EVERY foreign section survives, in order.
    assert "## Sentinel foreign section" in out
    assert "rows that another writer published" in out
    assert "## Gamma ledger" in out and "gamma body" in out
    assert out.index("Sentinel") < out.index("Gamma")


def test_rewrite_preamble_idempotent(tmp_path):
    p = str(tmp_path / "RESULTS.md")
    open(p, "w").write(DOC)
    head = "# RESULTS v2\n\n## Alpha (owned by sweep)\n\nnew alpha"
    owned = ("## Alpha (owned by sweep)",)
    _ledger.rewrite_preamble(p, head, owned)
    once = open(p).read()
    _ledger.rewrite_preamble(p, head, owned)
    assert open(p).read() == once


def test_replace_section_in_place(tmp_path):
    p = str(tmp_path / "RESULTS.md")
    open(p, "w").write(DOC)
    _ledger.replace_section(
        p, "## Sentinel foreign section",
        "## Sentinel foreign section\n\nrewritten rows\n",
    )
    out = open(p).read()
    assert "rewritten rows" in out
    assert "rows that another writer published" not in out
    # position preserved: still between Alpha and Gamma.
    assert out.index("## Alpha") < out.index("## Sentinel") < out.index("## Gamma")
    # everything else byte-identical.
    assert "alpha body" in out and "gamma body" in out
    assert out.startswith("# RESULTS — title")


def test_replace_section_appends_when_missing(tmp_path):
    p = str(tmp_path / "RESULTS.md")
    open(p, "w").write(DOC)
    _ledger.replace_section(p, "## Brand new", "## Brand new\n\nfresh\n")
    out = open(p).read()
    assert out.rstrip().endswith("fresh")
    assert "gamma body" in out


def test_replace_section_creates_file(tmp_path):
    p = str(tmp_path / "RESULTS.md")
    _ledger.replace_section(p, "## Only", "## Only\n\nbody")
    assert open(p).read() == "## Only\n\nbody\n"


def test_minres_sentinel_survives_sweep_style_rewrite(tmp_path):
    """The exact round-4 failure: a sweep rewrite with a section the sweep
    has never heard of (the MINRES ledger) present in the file."""
    p = str(tmp_path / "RESULTS.md")
    minres = (
        "## MINRES (symmetric indefinite, extension)\n\n"
        "| system | n | laps |\n|---|---|---|\n| helm | 100000 | 42 |\n"
    )
    open(p, "w").write(DOC + "\n" + minres)
    for _ in range(3):  # repeated sweeps must not erode it
        _ledger.rewrite_preamble(
            p, "# fresh sweep output\n\n## Alpha (owned by sweep)\n\nsweep",
            owned_headers=("## Alpha (owned by sweep)",),
        )
    out = open(p).read()
    assert "## MINRES (symmetric indefinite, extension)" in out
    assert "| helm | 100000 | 42 |" in out
    assert out.count("## MINRES") == 1
