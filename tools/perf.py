"""Perf probe harness: ``python tools/perf.py <probe>``.

Lists and dispatches the probes in tools/probes/ (one subcommand per
probe; ``--list`` shows all with one-line descriptions).  Probes run
against the live TPU — run ONE at a time (concurrent clients starve
each other through the axon relay and wreck timings).
"""

from __future__ import annotations

import argparse
import importlib
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tools.probes import PROBES  # noqa: E402


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("probe", nargs="?", choices=sorted(PROBES),
                   help="probe to run")
    p.add_argument("--list", action="store_true",
                   help="list probes with descriptions")
    args = p.parse_args(argv)
    if args.list or not args.probe:
        width = max(len(k) for k in PROBES)
        for name in sorted(PROBES):
            _, desc = PROBES[name]
            print(f"  {name:<{width}}  {desc}")
        return
    module, _ = PROBES[args.probe]
    importlib.import_module(module).main()


if __name__ == "__main__":
    main()
