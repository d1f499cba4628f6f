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


def render(path):
    """The notebook object a .py source converts to (deterministic)."""
    cells = parse_percent(Path(path).read_text())
    # Deterministic cell ids (nbformat draws random hex by default): the
    # committed .ipynb must be byte-stable under re-sync so the suite can
    # enforce .py <-> .ipynb consistency (tests/test_examples.py).
    for i, cell in enumerate(cells):
        cell["id"] = f"cell-{i}"
    return nbformat.v4.new_notebook(
        cells=cells,
        metadata={
            "kernelspec": {"display_name": "Python 3", "language": "python",
                           "name": "python3"},
            "language_info": {"name": "python"},
        },
    )


def convert(path):
    out = Path(path).with_suffix(".ipynb")
    nbformat.write(render(path), str(out))
    print(f"wrote {out}")


def check(path):
    """True iff the committed .ipynb matches what `convert` would write
    (pre-commit hook mode: `python notebooks/sync.py --check`)."""
    import json

    out = Path(path).with_suffix(".ipynb")
    if not out.exists():
        print(f"MISSING {out}")
        return False
    want = json.loads(nbformat.writes(render(path)))
    with open(out) as f:
        got = json.load(f)
    if got != want:
        print(f"STALE {out}: re-run notebooks/sync.py")
        return False
    return True


if __name__ == "__main__":
    argv = sys.argv[1:]
    check_mode = "--check" in argv
    argv = [a for a in argv if a != "--check"]
    targets = argv or sorted(
        p for p in Path(__file__).parent.glob("*.py") if p.name != "sync.py"
    )
    if check_mode:
        sys.exit(0 if all([check(t) for t in targets]) else 1)
    for t in targets:
        convert(t)
