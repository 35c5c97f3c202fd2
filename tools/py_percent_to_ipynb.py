"""Convert a py-percent script to a Jupyter notebook (optionally executed).

The reference ships its walkthroughs as .ipynb files
(/root/reference/notebooks/); this repo authors them as py-percent scripts
(reviewable, diffable, importable) and generates the notebook form:

    python tools/py_percent_to_ipynb.py examples/worked_example.py \
        notebooks/worked_example.ipynb [--execute]

--execute runs the notebook top-to-bottom with nbclient (CPU; the worked
example takes ~5-8 min) so the committed notebook carries real outputs.
"""

import argparse
import re
import sys


def parse_py_percent(text):
    """[(kind, source)] with kind in {'markdown', 'code'}."""
    cells = []
    kind, buf = None, []

    def flush():
        if kind is not None and any(line.strip() for line in buf):
            src = "\n".join(buf).strip("\n")
            cells.append((kind, src))

    for line in text.splitlines():
        m = re.match(r"^# %%(.*)$", line)
        if m:
            flush()
            kind = "markdown" if "[markdown]" in m.group(1) else "code"
            buf = []
            continue
        if kind == "markdown":
            buf.append(re.sub(r"^# ?", "", line))
        elif kind == "code":
            buf.append(line)
        # lines before the first marker are dropped (shebang/encoding)
    flush()
    return cells


def to_notebook(cells):
    import nbformat

    nb = nbformat.v4.new_notebook()
    nb.metadata["kernelspec"] = {"name": "python3",
                                 "display_name": "Python 3",
                                 "language": "python"}
    for kind, src in cells:
        cell = (nbformat.v4.new_markdown_cell(src) if kind == "markdown"
                else nbformat.v4.new_code_cell(src))
        nb.cells.append(cell)
    return nb


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("--execute", action="store_true")
    args = ap.parse_args(argv)

    import nbformat

    cells = parse_py_percent(open(args.src).read())
    assert cells, f"no py-percent cells found in {args.src}"
    nb = to_notebook(cells)
    if args.execute:
        from nbclient import NotebookClient
        NotebookClient(nb, timeout=1200,
                       resources={"metadata": {"path": "."}}).execute()
    nbformat.write(nb, args.dst)
    n_md = sum(1 for k, _ in cells if k == "markdown")
    print(f"wrote {args.dst}: {len(cells)} cells ({n_md} markdown)")


if __name__ == "__main__":
    sys.exit(main())
