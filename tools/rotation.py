"""Compute the round-5 _FRONT rotation list (NOTES_r4.md plan).

Per the rotation discipline: front-load the 50 queries LEAST recently
driver-verified — everything not in the latest CORRECTNESS json, in
registry order, with any changed-path queries manually promoted to
the head afterwards.

Usage: python tools/rotation.py [CORRECTNESS_r04.json]
Prints the python list literal to paste into __ray_entry__._FRONT.
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else "CORRECTNESS_r04.json"
    hashed = set(json.load(open(path)))
    sys.path.insert(0, ".")
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "e", "__ray_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    names = list(m.queries())
    front = [n for n in names if n not in hashed][:50]
    rest = [n for n in names if n not in front]
    print(f"# {len(front)} never/least-recently verified "
          f"(of {len(names)} registered; {len(hashed)} in {path})")
    print("_FRONT = [")
    for n in front:
        print(f'    "{n}",')
    print("]")
    print(f"# rotation queue follows registry order ({len(rest)} more)")


if __name__ == "__main__":
    main()
