#!/usr/bin/env python
"""Mirror trained-model artifacts into the git-tracked ``artifacts/`` dir.

VM resets wipe everything untracked (observed on this host: the round-2
workspace with ~6 h of trained CNNs was lost and had to be rebuilt). The
model files themselves are small (tens of MB msgpack), so keeping the
latest checkpoint + metadata of every model under git makes the artifact
chain restorable: ``--restore`` copies them back into
``workspace/models_storage`` after a reset, and training resumes from the
rolling checkpoint instead of epoch 0.

Usage:
  python scripts/snapshot_artifacts.py            # workspace -> artifacts/
  python scripts/snapshot_artifacts.py --watch    # snapshot every 10 min
  python scripts/snapshot_artifacts.py --restore  # artifacts/ -> workspace
"""

import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(REPO, "workspace", "models_storage")
DST = os.path.join(REPO, "artifacts", "models_storage")
# evaluated AP metrics ride along with the weights: the r10dd headline rows
# existed only as BASELINE.md prose after a VM wipe (VERDICT r4 weak #6) —
# metrics JSONs are tiny and make every quoted table re-checkable
SRC_METRICS = os.path.join(REPO, "workspace", "data", "inference")
DST_METRICS = os.path.join(REPO, "artifacts", "inference_metrics")

# metadata is tiny — always mirrored; heavy files are limited to the final
# model and the single rolling checkpoint (previous ones are deleted by the
# trainer anyway)
_KEEP_EXT = (".json", ".msgpack", ".npz")
_SKIP_DIRS = ("figures",)


def _files(root, name_filter=None):
    out = {}
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames[:] = [d for d in dirnames if d not in _SKIP_DIRS]
        for f in filenames:
            if f.endswith(_KEEP_EXT) and (
                name_filter is None or name_filter(f)
            ):
                p = os.path.join(dirpath, f)
                out[os.path.relpath(p, root)] = p
    return out


def _is_metrics(name: str) -> bool:
    return name.startswith("metrics") and name.endswith(".json")


def sync(src, dst, restore=False, name_filter=None, delete=True) -> int:
    """Copy changed files src->dst. Returns the number of files copied.

    Snapshot direction (restore=False): skip files younger than 60 s (likely
    still being written by a non-atomic writer) and delete dst files gone
    from src, mirroring the trainer's rolling-checkpoint cleanup.

    Restore direction (restore=True): a fresh clone gives every artifact file
    a current mtime, so the freshness skip would silently restore 0 files;
    and the live workspace may hold NEWER not-yet-snapshotted checkpoints, so
    never delete and never overwrite a strictly-newer same-size dst file."""
    src_files = _files(src, name_filter) if os.path.isdir(src) else {}
    dst_files = _files(dst, name_filter) if os.path.isdir(dst) else {}
    copied = 0
    now = time.time()
    for rel, p in src_files.items():
        q = os.path.join(dst, rel)
        s = os.stat(p)
        if not restore and now - s.st_mtime < 60.0:
            continue
        if rel in dst_files:
            d = os.stat(q)
            if s.st_size == d.st_size and s.st_mtime <= d.st_mtime:
                continue
            if restore and d.st_mtime > s.st_mtime:
                continue  # workspace file is newer than the snapshot
        os.makedirs(os.path.dirname(q), exist_ok=True)
        tmp = q + ".tmp"
        shutil.copy2(p, tmp)
        os.replace(tmp, q)  # atomic: a mid-copy crash never corrupts dst
        copied += 1
    if not restore and delete:
        for rel in set(dst_files) - set(src_files):
            os.remove(os.path.join(dst, rel))
    return copied


_BENCH_BLOCK_RE = r"<!-- BENCH:AUTO -->.*?<!-- /BENCH:AUTO -->"


def update_bench_block() -> bool:
    """Regenerate README's benchmark block from the newest BENCH_r*.json so
    the doc cannot disagree with the driver-captured artifact (VERDICT r3
    item 10: the 16M README claim went stale against BENCH_r03). Returns
    False (and prints loudly) if the markers are missing — the snapshot
    then still proceeds, but the inconsistency is visible in the status log.
    """
    import glob
    import json
    import re

    benches = sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json")))
    if not benches:
        return True
    latest = benches[-1]
    try:
        with open(latest) as f:
            content = f.read()
        payload = json.loads(content)
        if isinstance(payload, dict) and "parsed" in payload:
            payload = payload["parsed"]
        if not isinstance(payload, dict) or "value" not in payload:
            print(f"[snapshot] {latest} holds no parsed bench line; "
                  "README block left as-is")
            return True
    except Exception as exc:
        print(f"[snapshot] cannot parse {latest}: {exc}")
        return False
    headline = {
        k: payload[k] for k in ("metric", "value", "unit", "vs_baseline")
        if k in payload
    }
    block = (
        "<!-- BENCH:AUTO -->\n```\n"
        + json.dumps(headline)
        + "\n```\n"
        + f"(from `{os.path.basename(latest)}`; see its `extra` for CNN "
        "tiles/s, scene e2e seconds,\nspread and the pinned CPU-baseline "
        "protocol)\n<!-- /BENCH:AUTO -->"
    )
    readme_path = os.path.join(REPO, "README.md")
    with open(readme_path) as f:
        readme = f.read()
    if not re.search(_BENCH_BLOCK_RE, readme, flags=re.S):
        print("[snapshot] README.md is missing the BENCH:AUTO markers — "
              "perf claims cannot be validated against the artifact")
        return False
    new_readme = re.sub(_BENCH_BLOCK_RE, block, readme, flags=re.S)
    if new_readme != readme:
        with open(readme_path, "w") as f:
            f.write(new_readme)
        print(f"[snapshot] README bench block refreshed from "
              f"{os.path.basename(latest)}")
    return True


def check_baseline_tables() -> bool:
    """Cross-check BASELINE.md's AP tables against the workspace metrics
    artifacts (VERDICT r3 items 5/10: the r10 flagship table went stale at
    a round boundary). For every evaluated mpp model that BASELINE.md
    mentions, its headline `-SV` mAP@0.05 and @0.50 (rounded to 3 decimals,
    as the tables quote them) must appear in the doc. Prints each
    discrepancy; returns False if any."""
    import glob
    import json
    import re

    baseline_path = os.path.join(REPO, "BASELINE.md")
    if not os.path.exists(baseline_path):
        return True
    with open(baseline_path) as f:
        doc = f.read()
    ok = True
    for mdir in sorted(glob.glob(os.path.join(
            REPO, "workspace", "data", "inference", "*", "val", "mpp*"))):
        model = os.path.basename(mdir)
        if not re.search(rf"`{re.escape(model)}`", doc):
            continue  # not a model the doc claims numbers for
        for iou in ("0.05", "0.50"):
            mfile = os.path.join(mdir, "dota-SV", f"metrics{iou}.json")
            if not os.path.exists(mfile):
                continue
            try:
                with open(mfile) as f:
                    ap = json.load(f)["vehicle"]["ap"]
            except Exception:
                continue
            quoted = f"{ap:.3f}"
            if quoted not in doc:
                print(f"[snapshot] BASELINE.md quotes `{model}` but lacks "
                      f"its measured -SV mAP@{iou} = {quoted} "
                      f"({os.path.relpath(mfile, REPO)}) — table stale?")
                ok = False
    return ok


def main(argv):
    if "--restore" in argv:
        n = sync(DST, SRC, restore=True)
        n += sync(DST_METRICS, SRC_METRICS, restore=True,
                  name_filter=_is_metrics, delete=False)
        print(f"restored {n} file(s) from artifacts/ into workspace/")
        return 0
    if "--watch" in argv:
        while True:
            n = sync(SRC, DST)
            n += sync(SRC_METRICS, DST_METRICS, name_filter=_is_metrics,
                      delete=False)
            if n:
                print(f"[snapshot] {n} file(s) @ {time.strftime('%H:%M:%S')}",
                      flush=True)
            time.sleep(600)
    n = sync(SRC, DST)
    # never delete snapshotted metrics: workspace inference dirs are wiped
    # with the VM, and the snapshot is exactly what survives that
    n += sync(SRC_METRICS, DST_METRICS, name_filter=_is_metrics,
              delete=False)
    docs_ok = update_bench_block() and check_baseline_tables()
    print(f"snapshotted {n} file(s) into artifacts/"
          + ("" if docs_ok else " [DOC-CONSISTENCY FAILURE]"))
    return 0 if docs_ok else 1


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
