"""Build the static documentation site (the analogue of the reference's
Documenter.jl deployment, docs/make.jl:4-21 + Documentation.yml).

No external site generator is assumed: renders the repo's markdown pages
with python-markdown (+ pygments for fenced code) into ``docs/site/``.
CI runs this in the fast job (``.github/workflows/ci.yml``) so the site
always builds; deploy is any static host (gh-pages).

Run: python scripts/build_docs.py [--out docs/site]
"""

import argparse
import html
import os
import shutil
import sys

import markdown
from pygments.formatters import HtmlFormatter

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))

# (source file, output name, nav title)
PAGES = [
    ("README.md", "index.html", "Overview"),
    ("docs/api.md", "api.html", "API reference"),
    ("BENCH.md", "bench.html", "Benchmarks"),
    ("COVERAGE.md", "coverage.html", "Reference coverage"),
    ("ROADMAP.md", "roadmap.html", "Roadmap"),
]

TEMPLATE = """<!DOCTYPE html>
<html lang="en">
<head>
<meta charset="utf-8">
<meta name="viewport" content="width=device-width, initial-scale=1">
<title>{title} — ilqr_tpu</title>
<style>
:root {{ --fg: #1a1a1a; --bg: #ffffff; --accent: #0b5fff; --muted: #6a737d;
        --border: #e1e4e8; --code-bg: #f6f8fa; }}
@media (prefers-color-scheme: dark) {{
  :root {{ --fg: #c9d1d9; --bg: #0d1117; --accent: #58a6ff; --muted: #8b949e;
          --border: #30363d; --code-bg: #161b22; }}
}}
* {{ box-sizing: border-box; }}
body {{ margin: 0; font: 16px/1.6 -apple-system, "Segoe UI", Roboto,
       Helvetica, Arial, sans-serif; color: var(--fg);
       background: var(--bg); }}
nav {{ position: sticky; top: 0; background: var(--bg);
      border-bottom: 1px solid var(--border); padding: 0.6rem 1.2rem;
      display: flex; gap: 1.2rem; flex-wrap: wrap; z-index: 10; }}
nav a {{ color: var(--muted); text-decoration: none; font-weight: 500; }}
nav a.active, nav a:hover {{ color: var(--accent); }}
nav .brand {{ color: var(--fg); font-weight: 700; }}
main {{ max-width: 60rem; margin: 0 auto; padding: 1.5rem 1.2rem 4rem; }}
h1, h2, h3 {{ line-height: 1.25; }}
h2 {{ border-bottom: 1px solid var(--border); padding-bottom: 0.3rem; }}
a {{ color: var(--accent); }}
code {{ background: var(--code-bg); padding: 0.15em 0.35em;
       border-radius: 4px; font-size: 0.92em; }}
pre {{ background: var(--code-bg); padding: 0.9rem 1rem; border-radius: 8px;
      overflow-x: auto; border: 1px solid var(--border); }}
pre code {{ background: none; padding: 0; }}
table {{ border-collapse: collapse; display: block; overflow-x: auto;
        max-width: 100%; }}
th, td {{ border: 1px solid var(--border); padding: 0.35rem 0.6rem;
         text-align: left; }}
th {{ background: var(--code-bg); }}
blockquote {{ border-left: 4px solid var(--border); margin-left: 0;
             padding-left: 1rem; color: var(--muted); }}
{pygments_css}
</style>
</head>
<body>
<nav><span class="brand">ilqr_tpu</span>{nav}</nav>
<main>
{body}
</main>
</body>
</html>
"""


def build(out_dir: str) -> int:
    os.makedirs(out_dir, exist_ok=True)
    md = markdown.Markdown(
        extensions=["fenced_code", "tables", "codehilite", "toc"],
        extension_configs={"codehilite": {"guess_lang": False}},
    )
    pygments_css = HtmlFormatter().get_style_defs(".codehilite")

    built = 0
    for src, out_name, title in PAGES:
        path = os.path.join(ROOT, src)
        if not os.path.exists(path):
            print(f"skip {src} (missing)", file=sys.stderr)
            continue
        with open(path) as f:
            text = f.read()
        md.reset()
        body = md.convert(text)
        nav = "".join(
            f'<a href="{o}"{" class=\"active\"" if o == out_name else ""}>'
            f"{html.escape(t)}</a>"
            for s, o, t in PAGES if os.path.exists(os.path.join(ROOT, s)))
        page = TEMPLATE.format(title=html.escape(title), nav=nav, body=body,
                               pygments_css=pygments_css)
        with open(os.path.join(out_dir, out_name), "w") as f:
            f.write(page)
        built += 1
        print(f"built {out_name} <- {src}")
    return built


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(ROOT, "docs", "site"))
    ap.add_argument("--clean", action="store_true")
    args = ap.parse_args()
    if args.clean and os.path.isdir(args.out):
        shutil.rmtree(args.out)
    n = build(args.out)
    if n == 0:
        sys.exit("no pages built")
    print(f"site: {args.out} ({n} pages)")


if __name__ == "__main__":
    main()
