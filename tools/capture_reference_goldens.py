#!/usr/bin/env python
"""One-command verbatim reference-golden capture.

Usage (the moment /root/reference is populated):

    python tools/capture_reference_goldens.py --reference /root/reference

Runs the reference pyGPs package on the deterministic fixtures of
pygps_tpu.utils.refcapture, writes tests/goldens/goldens_reference.json,
and tests/test_goldens.py's parity section switches to verbatim mode on
the next pytest run.  Exercised against a mocked reference tree by
tests/test_capture_harness.py.
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pygps_tpu.utils import refcapture


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", default="/root/reference",
                    help="path to the reference pyGPs tree")
    ap.add_argument("--out", default=None,
                    help="output JSON (default tests/goldens/"
                         "goldens_reference.json)")
    args = ap.parse_args()
    out = args.out or refcapture.default_out_path()
    gold = refcapture.capture(args.reference, out)
    ok = [k for k, v in gold.items()
          if not k.startswith("_") and "error" not in v]
    bad = {k: v["error"] for k, v in gold.items()
           if not k.startswith("_") and "error" in v}
    print(json.dumps({"written": str(out), "captured": ok,
                      "errors": bad}, indent=1))
    return 1 if bad and not ok else 0


if __name__ == "__main__":
    sys.exit(main())
