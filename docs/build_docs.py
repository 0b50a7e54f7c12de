"""Render the markdown docs into a static HTML site (docs/_site).

The reference publishes a sphinx site per module plus executable tutorial
notebooks (reference docs/index.rst:30-45, .readthedocs.yml). This repo's
environment bakes in python-markdown + pygments but no sphinx/mkdocs, so
the site builder is first-party: every docs/*.md page renders with a
shared navigation sidebar, fenced-code highlighting, and tables; the
tutorials under docs/tutorials/ are included as highlighted source pages
(CI executes them separately — see .github/workflows/tests.yml).

Usage: python docs/build_docs.py [outdir]
"""

import html
import pathlib
import sys

import markdown

DOCS = pathlib.Path(__file__).resolve().parent

PAGE_ORDER = [
    ("index", "Overview"),
    ("getting_started", "Getting started"),
    ("migration", "Migrating from the reference"),
    ("core", "Core containers"),
    ("spectral", "Spectral (GLS, BGLST)"),
    ("phase", "Phase folding"),
    ("decomposition", "Decomposition"),
    ("timefrequency", "Time-frequency"),
    ("gp", "Gaussian processes"),
    ("parallel", "Parallelism"),
    ("performance", "Performance"),
]

CSS = """
body { margin: 0; font: 15px/1.6 -apple-system, "Segoe UI", Roboto,
       sans-serif; color: #1a1a2e; }
.layout { display: flex; min-height: 100vh; }
nav { width: 232px; flex-shrink: 0; background: #f4f5f7;
      border-right: 1px solid #e1e4e8; padding: 1.2rem 0; }
nav h1 { font-size: 1rem; padding: 0 1.2rem; }
nav a { display: block; padding: 0.28rem 1.2rem; color: #344;
        text-decoration: none; font-size: 0.92rem; }
nav a.current { background: #e2e8f0; font-weight: 600; }
nav .sec { padding: 0.8rem 1.2rem 0.2rem; font-size: 0.75rem;
           text-transform: uppercase; letter-spacing: 0.06em; color: #778; }
main { padding: 1.6rem 2.4rem; max-width: 54rem; min-width: 0; }
pre { background: #f6f8fa; border-radius: 6px; padding: 0.8rem 1rem;
      overflow-x: auto; font-size: 0.86rem; }
code { font-family: ui-monospace, "SF Mono", Menlo, monospace; }
p > code, li > code, td > code { background: #f0f1f3; border-radius: 4px;
      padding: 0.08em 0.35em; font-size: 0.88em; }
table { border-collapse: collapse; display: block; overflow-x: auto; }
th, td { border: 1px solid #d9dde2; padding: 0.35rem 0.6rem;
         font-size: 0.9rem; }
th { background: #f4f5f7; }
h1, h2, h3 { line-height: 1.25; }
a { color: #0b5fa5; }
"""


def _nav(current, tutorials):
    items = ['<h1>periodicity-tpu</h1>']
    for slug, title in PAGE_ORDER:
        cls = ' class="current"' if slug == current else ""
        items.append(f'<a href="{slug}.html"{cls}>{title}</a>')
    items.append('<div class="sec">Tutorials</div>')
    for tut in tutorials:
        cls = ' class="current"' if tut.stem == current else ""
        items.append(
            f'<a href="{tut.stem}.html"{cls}>{tut.stem.replace("_", " ")}</a>'
        )
    return "\n".join(items)


def _render(title, body_html, current, tutorials):
    return (
        "<!doctype html><html><head><meta charset='utf-8'>"
        f"<title>{html.escape(title)} — periodicity-tpu</title>"
        f"<style>{CSS}</style>"
        "<style>"
        + _pygments_css()
        + "</style></head><body><div class='layout'>"
        f"<nav>{_nav(current, tutorials)}</nav>"
        f"<main>{body_html}</main>"
        "</div></body></html>"
    )


def _pygments_css():
    try:
        from pygments.formatters import HtmlFormatter

        return HtmlFormatter().get_style_defs(".codehilite")
    except ImportError:
        return ""


def _highlight_source(path):
    src = path.read_text()
    try:
        from pygments import highlight
        from pygments.formatters import HtmlFormatter
        from pygments.lexers import PythonLexer

        return highlight(src, PythonLexer(), HtmlFormatter(cssclass="codehilite"))
    except ImportError:
        return f"<pre><code>{html.escape(src)}</code></pre>"


def build(outdir=None):
    out = pathlib.Path(outdir) if outdir else DOCS / "_site"
    out.mkdir(parents=True, exist_ok=True)
    md = markdown.Markdown(
        extensions=["fenced_code", "tables", "codehilite", "toc"],
        extension_configs={"codehilite": {"guess_lang": False}},
    )
    tutorials = sorted((DOCS / "tutorials").glob("*.py"))

    built = []
    for slug, title in PAGE_ORDER:
        src = DOCS / f"{slug}.md"
        if not src.exists():
            raise SystemExit(f"missing docs page: {src}")
        md.reset()
        body = md.convert(src.read_text())
        # md links between pages -> html links
        body = body.replace('.md"', '.html"')
        (out / f"{slug}.html").write_text(
            _render(title, body, slug, tutorials)
        )
        built.append(f"{slug}.html")

    for tut in tutorials:
        doc = tut.read_text().split('"""')[1] if '"""' in tut.read_text() else ""
        head = f"<h1>{html.escape(tut.stem.replace('_', ' '))}</h1>"
        head += f"<p>{html.escape(doc.strip().splitlines()[0] if doc else '')}</p>"
        # rendered-figure artifacts (reference tutorials are notebooks with
        # inline figures): the CI docs job executes each tutorial with
        # PERIODICITY_TPU_FIGDIR pointing at <out>/figures BEFORE building,
        # and any PNG named <stem>*.png is embedded above the source
        figures = sorted((out / "figures").glob(f"{tut.stem}*.png")) \
            if (out / "figures").is_dir() else []
        fig_html = "".join(
            f'<figure><img src="figures/{f.name}" alt="{html.escape(f.stem)}"'
            f' style="max-width:100%"/></figure>'
            for f in figures
        )
        body = head + fig_html + _highlight_source(tut)
        (out / f"{tut.stem}.html").write_text(
            _render(tut.stem, body, tut.stem, tutorials)
        )
        built.append(f"{tut.stem}.html")

    print(f"built {len(built)} pages -> {out}")
    return out


if __name__ == "__main__":
    build(sys.argv[1] if len(sys.argv) > 1 else None)
