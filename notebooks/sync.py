#!/usr/bin/env python
"""Convert the percent-format notebook scripts to .ipynb.

Stands in for the reference's jupytext pairing (reference README.md:51-57,
.pre-commit-config.yaml:37-41) — jupytext is not available in this image, so
this minimal converter (nbformat only) keeps the .py files authoritative and
regenerates the .ipynb files:

    python notebooks/sync.py            # convert all notebooks/*.py
    python notebooks/sync.py FILE.py    # convert one

Cells are delimited by `# %%` (code) and `# %% [markdown]` (markdown, with
the leading `# ` stripped). The jupytext YAML header is dropped.
"""

import re
import sys
from pathlib import Path

import nbformat

CELL_RE = re.compile(r"^# %%(?: \[(\w+)\])?\s*$")


def parse_percent(text):
    lines = text.splitlines()
    # Drop the jupytext header (first `# ---` ... `# ---` block).
    i = 0
    if lines and lines[0].startswith("# -*-"):
        i = 1
    if i < len(lines) and lines[i].strip() == "# ---":
        i += 1
        while i < len(lines) and lines[i].strip() != "# ---":
            i += 1
        i += 1
    cells, kind, buf = [], None, []

    def flush():
        if kind is None:
            return
        body = "\n".join(buf).strip("\n")
        if not body:
            return
        if kind == "markdown":
            body = "\n".join(
                ln[2:] if ln.startswith("# ") else (ln[1:] if ln.startswith("#") else ln)
                for ln in body.splitlines()
            )
            cells.append(nbformat.v4.new_markdown_cell(body))
        else:
            cells.append(nbformat.v4.new_code_cell(body))

    for ln in lines[i:]:
        m = CELL_RE.match(ln)
        if m:
            flush()
            kind = m.group(1) or "code"
            buf = []
        elif kind is not None:
            buf.append(ln)
    flush()
    return cells


def convert(path):
    path = Path(path)
    cells = parse_percent(path.read_text())
    # Deterministic cell ids (nbformat draws random hex by default): the
    # committed .ipynb must be byte-stable under re-sync so the suite can
    # enforce .py <-> .ipynb consistency (tests/test_examples.py).
    for i, cell in enumerate(cells):
        cell["id"] = f"cell-{i}"
    nb = nbformat.v4.new_notebook(
        cells=cells,
        metadata={
            "kernelspec": {"display_name": "Python 3", "language": "python",
                           "name": "python3"},
            "language_info": {"name": "python"},
        },
    )
    out = path.with_suffix(".ipynb")
    nbformat.write(nb, str(out))
    print(f"wrote {out}")


if __name__ == "__main__":
    targets = sys.argv[1:] or sorted(
        p for p in Path(__file__).parent.glob("*.py") if p.name != "sync.py"
    )
    for t in targets:
        convert(t)
