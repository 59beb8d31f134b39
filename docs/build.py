"""Static documentation build: docs/*.md -> docs/_build/*.html.

The reference ships a sphinx/readthedocs site (reference:
docs/source/conf.py, docs/source/index.rst); this environment has no
sphinx, so this is a dependency-light equivalent over the same content:
every markdown page rendered with a navigation sidebar and an index, one
self-contained HTML file per page.

Usage:  python docs/build.py [--out docs/_build]
Exits nonzero if any page fails to render (CI gate).
"""
import argparse
import os
import sys

import markdown

HERE = os.path.dirname(os.path.abspath(__file__))

# index order mirrors the reference's toctree (docs/source/index.rst)
PAGES = [
    ("quickstart.md", "Quickstart"),
    ("installation.md", "Installation"),
    ("cmd.md", "Command line arguments"),
    ("training.md", "Training"),
    ("help.md", "Getting help"),
    ("citing.md", "Citing"),
    ("release_notes.md", "Release notes"),
]

TEMPLATE = """<!doctype html>
<html lang="en"><head><meta charset="utf-8">
<meta name="viewport" content="width=device-width, initial-scale=1">
<title>{title} — m6anet_tpu</title>
<style>
 body {{ margin: 0; font: 16px/1.55 system-ui, sans-serif; color: #1a1a1a; }}
 .wrap {{ display: flex; min-height: 100vh; }}
 nav {{ width: 230px; flex: none; background: #f4f4f2; padding: 1.2rem;
       border-right: 1px solid #ddd; }}
 nav h1 {{ font-size: 1.05rem; margin: 0 0 .8rem; }}
 nav a {{ display: block; padding: .22rem 0; color: #2a5d9c;
         text-decoration: none; }}
 nav a.current {{ font-weight: 600; color: #123; }}
 main {{ flex: 1; max-width: 54rem; padding: 1.5rem 2.2rem 4rem; }}
 pre {{ background: #f6f8fa; padding: .8rem 1rem; overflow-x: auto;
       border-radius: 6px; font-size: .88em; }}
 code {{ background: #f2f2f0; padding: .08em .3em; border-radius: 3px;
        font-size: .92em; }}
 pre code {{ background: none; padding: 0; }}
 table {{ border-collapse: collapse; }}
 th, td {{ border: 1px solid #ccc; padding: .35rem .6rem; }}
 h1, h2, h3 {{ line-height: 1.25; }}
 a {{ color: #2a5d9c; }}
</style></head><body><div class="wrap">
<nav><h1><a href="index.html">m6anet_tpu</a></h1>{nav}</nav>
<main>{body}</main>
</div></body></html>
"""


def render(out_dir: str) -> int:
    os.makedirs(out_dir, exist_ok=True)
    md = markdown.Markdown(extensions=["fenced_code", "tables", "toc"])
    failures = 0

    def nav_html(current: str) -> str:
        items = []
        for fname, title in PAGES:
            href = fname.replace(".md", ".html")
            cls = ' class="current"' if fname == current else ""
            items.append(f'<a href="{href}"{cls}>{title}</a>')
        return "\n".join(items)

    for fname, title in PAGES:
        path = os.path.join(HERE, fname)
        try:
            with open(path, encoding="utf-8") as f:
                body = md.reset().convert(f.read())
        except Exception as e:  # noqa: BLE001 — report all failures, then exit nonzero
            print(f"FAIL {fname}: {e}", file=sys.stderr)
            failures += 1
            continue
        out = os.path.join(out_dir, fname.replace(".md", ".html"))
        with open(out, "w", encoding="utf-8") as f:
            f.write(TEMPLATE.format(title=title, nav=nav_html(fname), body=body))
        print(f"rendered {fname} -> {out}")

    index_items = "".join(
        f'<li><a href="{f.replace(".md", ".html")}">{t}</a></li>' for f, t in PAGES
    )
    index_body = (
        "<h1>m6anet_tpu documentation</h1>"
        "<p>TPU-native m6A calling engine with the capability surface of "
        "<a href='https://github.com/GoekeLab/m6anet'>m6anet</a>.</p>"
        f"<ul>{index_items}</ul>"
    )
    with open(os.path.join(out_dir, "index.html"), "w", encoding="utf-8") as f:
        f.write(TEMPLATE.format(title="Documentation", nav=nav_html(""), body=index_body))
    print(f"rendered index -> {os.path.join(out_dir, 'index.html')}")
    return failures


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(HERE, "_build"))
    args = ap.parse_args()
    sys.exit(1 if render(args.out) else 0)
