#!/usr/bin/env python3
"""Compose SCALESWEEP_r{N}.json from one or more ScaleSweep output files.

Usage: merge_sweeps.py <round> <note-file-or-> <out> <label>=<file> ...

Each labeled file is embedded verbatim under "sweeps"[label]; the top-level
note carries the human attribution (what was re-measured and why). Dev
tooling only — the shipped library has no Python dependency.
"""
import json, sys

def main(argv):
    rnd, note_src, out = argv[1], argv[2], argv[3]
    note = sys.stdin.read() if note_src == "-" else open(note_src).read()
    sweeps = {}
    for spec in argv[4:]:
        label, path = spec.split("=", 1)
        sweeps[label] = json.load(open(path))
    json.dump({"round": int(rnd), "note": note.strip(), "sweeps": sweeps},
              open(out, "w"), indent=1)
    print(f"wrote {out}: {list(sweeps)}")

if __name__ == "__main__":
    main(sys.argv)
