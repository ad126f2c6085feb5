"""Regenerate docs/api.md — one line per public symbol.

Usage: python validation/make_api_index.py   (CPU-only; run after adding
or renaming public API so the index stays honest).
"""
import importlib
import inspect
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

MODS = ["network", "config", "ybus", "devices", "fundamental", "harmonic",
        "arrow", "lanes", "solve", "results", "flows", "impedance",
        "optimize", "activefilter", "converters", "longline", "lineskin",
        "loadmodel", "sequence", "threephase", "modes", "iec", "studies",
        "contingency", "capacity", "estimate", "background", "sensitivity",
        "extended", "kron", "generators", "simulate", "ne_pipeline",
        "trajlog", "checkpoint", "warmstart", "matpower", "opendss", "cx",
        "placement", "parallel.mesh"]


def main():
    lines = ["# hpfx API index", "",
             "One line per public symbol (module `__all__` + first "
             "docstring sentence); see docs/guide.md for task-oriented "
             "usage and the per-function docstrings for reference line "
             "citations.  Regenerate with "
             "`python validation/make_api_index.py`.", ""]
    for name in MODS:
        mod = importlib.import_module(f"hpfx.{name}")
        pub = getattr(mod, "__all__", None)
        if pub is None:
            pub = [k for k in vars(mod)
                   if not k.startswith("_")
                   and getattr(getattr(mod, k), "__module__", "")
                   == mod.__name__]
        if not pub:
            continue
        head = (mod.__doc__ or "").strip().splitlines()
        lines.append(f"## `hpfx.{name}` — "
                     f"{head[0] if head else ''}")
        lines.append("")
        for sym in pub:
            obj = getattr(mod, sym, None)
            doc = (inspect.getdoc(obj) or "").strip().splitlines()
            one = doc[0] if doc else ""
            if len(one) > 100:
                one = one[:97] + "..."
            kind = ("class" if inspect.isclass(obj)
                    else "fn" if callable(obj) else "const")
            lines.append(f"- `{sym}` ({kind}): {one}")
        lines.append("")
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "api.md")
    with open(out, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {out}: {sum(l.startswith('- ') for l in lines)} symbols")


if __name__ == "__main__":
    main()
