"""Shared test helper: snapshot a results dir's DOTA translation files.

Used by the resume-replay regression tests — re-running ``infer`` with
``overwrite=False`` must reproduce the translations exactly from the
existing result pickles (round-4 post-mortem: skipped images silently
vanished from the rewritten det/gt export and scored a finished arm 0.0).
"""

import glob
import os


def dota_snapshot(results_dir):
    out = {}
    for f in glob.glob(
        os.path.join(results_dir, "dota*", "**", "*.txt"), recursive=True
    ):
        with open(f) as fh:
            out[os.path.relpath(f, results_dir)] = fh.read()
    return out
