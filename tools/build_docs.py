"""Build the static HTML documentation site.

The reference publishes a sphinx/readthedocs site
(reference: docs/source/*.rst, .readthedocs.yaml); this repo's docs are
markdown, and the build environment ships no sphinx/mkdocs — so this is
the equivalent, self-contained builder: it renders ``README.md``,
``CHANGELOG.md`` and every page under ``docs/`` with ``markdown-it``
(+ pygments fenced-code highlighting), generates a per-module API
reference from the live package's docstrings, and writes a navigable
static site.

Usage::

    python tools/build_docs.py [--out build/docs]

Exit status is nonzero if any page fails to render or any public module
fails to import — the tox ``docs`` env and ``tests/test_docs_build.py``
gate on it.
"""

import argparse
import html
import importlib
import inspect
import os
import sys

_DOC_MODULES = [
    "speech_tpu",
    "speech_tpu.alias",
    "speech_tpu.aot",
    "speech_tpu.compute",
    "speech_tpu.config",
    "speech_tpu.corpus",
    "speech_tpu.filters",
    "speech_tpu.io",
    "speech_tpu.io.kaldi_tables",
    "speech_tpu.io.sphere",
    "speech_tpu.models",
    "speech_tpu.models.checkpoint",
    "speech_tpu.models.ctc",
    "speech_tpu.models.kws",
    "speech_tpu.models.speaker",
    "speech_tpu.models.presets",
    "speech_tpu.nn",
    "speech_tpu.ops.augment",
    "speech_tpu.ops.framing",
    "speech_tpu.ops.invert",
    "speech_tpu.ops.pallas_stft",
    "speech_tpu.ops.pitch",
    "speech_tpu.ops.postops",
    "speech_tpu.ops.resample",
    "speech_tpu.ops.si",
    "speech_tpu.ops.stft",
    "speech_tpu.ops.vad",
    "speech_tpu.ops.xmath",
    "speech_tpu.parallel",
    "speech_tpu.parallel.extract",
    "speech_tpu.parallel.halo",
    "speech_tpu.parallel.multihost",
    "speech_tpu.parallel.stats",
    "speech_tpu.post",
    "speech_tpu.pre",
    "speech_tpu.profiling",
    "speech_tpu.scales",
    "speech_tpu.serve",
    "speech_tpu.streaming",
    "speech_tpu.streaming_post",
    "speech_tpu.torch",
    "speech_tpu.utils",
    "speech_tpu.vis",
]

_STYLE = """
body { font-family: -apple-system, system-ui, sans-serif; margin: 0;
       color: #1a1a1a; }
.wrap { display: flex; }
nav { min-width: 230px; max-width: 230px; padding: 1rem; background:
      #f6f8fa; min-height: 100vh; font-size: 0.9rem; }
nav a { display: block; color: #0757ba; text-decoration: none;
        padding: 2px 0; }
main { padding: 1rem 3rem; max-width: 52rem; }
pre { background: #f6f8fa; padding: 0.8rem; overflow-x: auto;
      border-radius: 6px; font-size: 0.85rem; }
code { background: #f2f2f2; border-radius: 3px; padding: 0 3px;
       font-size: 0.9em; }
pre code { background: none; padding: 0; }
table { border-collapse: collapse; }
td, th { border: 1px solid #ccc; padding: 4px 8px; }
h1, h2 { border-bottom: 1px solid #eee; padding-bottom: 4px; }
.sig { background: #eef4fb; padding: 0.4rem 0.6rem; border-radius: 4px;
       font-family: monospace; white-space: pre-wrap; }
.docstring { margin: 0.4rem 0 1.2rem 1rem; white-space: pre-wrap;
             font-size: 0.92rem; }
"""


def _md_renderer():
    from markdown_it import MarkdownIt

    try:
        from pygments import highlight
        from pygments.formatters import HtmlFormatter
        from pygments.lexers import TextLexer, get_lexer_by_name

        def hl(code, lang, attrs):
            try:
                lexer = get_lexer_by_name(lang or "text")
            except Exception:
                lexer = TextLexer()
            return highlight(code, lexer, HtmlFormatter(nowrap=True))

    except ImportError:  # pragma: no cover - pygments is in the image
        hl = None
    md = MarkdownIt("gfm-like", {"highlight": hl})
    md.options["linkify"] = False  # linkify-it-py isn't in the image
    return md


def _page(title, nav_html, body, depth=0):
    root = "../" * depth
    return f"""<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>{html.escape(title)}</title>
<style>{_STYLE}</style></head>
<body><div class="wrap">
<nav><a href="{root}index.html"><b>speech_tpu</b></a>{nav_html}</nav>
<main>{body}</main>
</div></body></html>"""


def _rewrite_links(text_html, depth=0):
    """``*.md`` links -> the rendered ``*.html`` pages."""
    import re

    def fix(m):
        target = m.group(1)
        if target.startswith(("http:", "https:", "#")):
            return m.group(0)
        target = target.replace("docs/", "")
        return 'href="' + target.replace(".md", ".html") + '"'

    return re.sub(r'href="([^"]+)"', fix, text_html)


def _api_page(modname):
    mod = importlib.import_module(modname)
    parts = [f"<h1><code>{html.escape(modname)}</code></h1>"]
    if mod.__doc__:
        parts.append(
            f'<div class="docstring">{html.escape(inspect.cleandoc(mod.__doc__))}</div>'
        )
    names = getattr(mod, "__all__", None)
    if names is None:
        names = [n for n in sorted(vars(mod)) if not n.startswith("_")]
    for name in names:
        obj = getattr(mod, name, None)
        if obj is None or inspect.ismodule(obj):
            continue
        own = getattr(obj, "__module__", modname) == modname
        if inspect.isclass(obj) or inspect.isfunction(obj):
            try:
                sig = str(inspect.signature(obj))
            except (ValueError, TypeError):
                sig = "(...)"
            kind = "class" if inspect.isclass(obj) else "def"
            parts.append(
                f'<h3 id="{html.escape(name)}"><code>{name}</code></h3>'
            )
            parts.append(
                f'<div class="sig">{kind} {html.escape(name + sig)}</div>'
            )
            doc = inspect.getdoc(obj)
            if doc:
                parts.append(
                    f'<div class="docstring">{html.escape(doc)}</div>'
                )
            if inspect.isclass(obj) and own:
                for mname, meth in sorted(vars(obj).items()):
                    if mname.startswith("_") or not (
                        inspect.isfunction(meth) or isinstance(meth, property)
                    ):
                        continue
                    mdoc = inspect.getdoc(meth)
                    if isinstance(meth, property):
                        msig = " (property)"
                    else:
                        try:
                            msig = str(inspect.signature(meth))
                        except (ValueError, TypeError):
                            msig = "(...)"
                    parts.append(
                        f'<div class="sig">{html.escape(name)}.'
                        f"{html.escape(mname + msig)}</div>"
                    )
                    if mdoc:
                        parts.append(
                            f'<div class="docstring">{html.escape(mdoc)}</div>'
                        )
        else:
            parts.append(
                f'<h3 id="{html.escape(name)}"><code>{name}</code></h3>'
                f'<div class="sig">{html.escape(repr(obj)[:200])}</div>'
            )
    return "\n".join(parts)


def build(out_dir: str, root: str) -> int:
    md = _md_renderer()
    os.makedirs(os.path.join(out_dir, "api"), exist_ok=True)

    doc_dir = os.path.join(root, "docs")
    pages = [("index", os.path.join(root, "README.md"), "Overview")]
    for fname in sorted(os.listdir(doc_dir)):
        if fname.endswith(".md"):
            stem = fname[:-3]
            pages.append(
                (stem, os.path.join(doc_dir, fname), stem.replace("-", " ").title())
            )
    pages.append(
        ("changelog", os.path.join(root, "CHANGELOG.md"), "Changelog")
    )

    def nav(depth):
        r = "../" * depth
        items = [
            f'<a href="{r}{stem}.html">{html.escape(title)}</a>'
            for stem, _, title in pages
            if stem != "index"
        ]
        items.append(f'<a href="{r}api/index.html">API reference</a>')
        return "\n" + "\n".join(items)

    failures = 0
    for stem, path, title in pages:
        try:
            with open(path) as src:
                text = src.read()
            body = _rewrite_links(md.render(text))
            out = _page(f"speech_tpu — {title}", nav(0), body)
            with open(os.path.join(out_dir, f"{stem}.html"), "w") as f:
                f.write(out)
        except Exception as e:  # pragma: no cover - render failure gate
            print(f"FAILED rendering {path}: {e}", file=sys.stderr)
            failures += 1

    api_index = ["<h1>API reference</h1><ul>"]
    for modname in _DOC_MODULES:
        fname = modname.replace(".", "_") + ".html"
        try:
            body = _api_page(modname)
        except Exception as e:
            print(f"FAILED importing {modname}: {e}", file=sys.stderr)
            failures += 1
            continue
        with open(os.path.join(out_dir, "api", fname), "w") as f:
            f.write(_page(f"speech_tpu — {modname}", nav(1), body, depth=1))
        api_index.append(
            f'<li><a href="{fname}"><code>{html.escape(modname)}</code></a></li>'
        )
    api_index.append("</ul>")
    with open(os.path.join(out_dir, "api", "index.html"), "w") as f:
        f.write(
            _page(
                "speech_tpu — API reference",
                nav(1),
                "\n".join(api_index),
                depth=1,
            )
        )
    n_pages = len(pages) + len(_DOC_MODULES) + 1
    print(f"built {n_pages - failures}/{n_pages} pages into {out_dir}")
    return 1 if failures else 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--out", default="build/docs")
    args = parser.parse_args(argv)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if root not in sys.path:  # `python tools/build_docs.py` puts tools/
        sys.path.insert(0, root)  # on sys.path, not the repo root
    return build(args.out, root)


if __name__ == "__main__":
    sys.exit(main())
