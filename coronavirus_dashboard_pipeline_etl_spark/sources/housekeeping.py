"""S14 — tar/archive housekeeping: release-artifact lifecycle.

The reference's housekeeping pipeline tars aged release blobs into
``tar.bz2`` archives with a manifest and then disposes of the originals
(``housekeeping_archiver/process.py:127-202``; task manifests
``housekeeping_orchestrator/tasks.py:22-96``). This is storage
lifecycle, not query processing — correctly a driver-side utility over
the engine's OUTPUT artifacts (the same judgement the reference makes:
one small function, not a fan-out).

``archive_releases`` implements the same archive→manifest→dispose
contract with stdlib tarfile/bz2: newest ``keep_latest`` release
groups stay live, older groups are tarred (deterministic member order,
pinned mtimes so re-runs are byte-stable), a JSON manifest records
name/size/sha256 per member, and disposal only happens AFTER the
archive is fully written and fsync'd — the crash-safe ordering.
"""

from __future__ import annotations

import hashlib
import io
import json
import os
import tarfile


def archive_releases(
    src_dir: str,
    archive_dir: str,
    keep_latest: int = 3,
    group: "object" = None,
    dispose: bool = True,
    compression: str = "bz2",
) -> dict:
    """Archive all but the newest ``keep_latest`` release groups.

    Files in ``src_dir`` are grouped by ``group(filename)`` (default:
    the prefix before the first ``_``, the reference's
    ``<date>_<artifact>`` naming); groups sort lexicographically
    (ISO dates sort correctly). Each aged group becomes
    ``<group>.tar.<compression>`` plus ``<group>.manifest.json`` in
    ``archive_dir``; originals are removed only after the archive is
    durably on disk. Returns ``{group: {"files": n, "bytes": n}}``
    for the archived groups.
    """
    if compression not in ("bz2", "gz", "xz"):
        raise ValueError(f"unsupported compression {compression!r}")
    key = group or (lambda name: name.split("_", 1)[0])
    groups: dict[str, list[str]] = {}
    for name in sorted(os.listdir(src_dir)):
        path = os.path.join(src_dir, name)
        if os.path.isfile(path):
            groups.setdefault(key(name), []).append(name)
    aged = sorted(groups)[: max(len(groups) - keep_latest, 0)]
    os.makedirs(archive_dir, exist_ok=True)
    report: dict[str, dict] = {}
    for g in aged:
        members = groups[g]
        manifest = []
        tar_path = os.path.join(archive_dir, f"{g}.tar.{compression}")
        with tarfile.open(tar_path, f"w:{compression}") as tar:
            for name in members:  # sorted: deterministic member order
                path = os.path.join(src_dir, name)
                data = open(path, "rb").read()
                manifest.append(
                    {
                        "name": name,
                        "bytes": len(data),
                        "sha256": hashlib.sha256(data).hexdigest(),
                    }
                )
                info = tarfile.TarInfo(name)
                info.size = len(data)
                info.mtime = 0  # pinned: re-runs are byte-stable
                tar.addfile(info, io.BytesIO(data))
        with open(tar_path, "rb") as fh:  # durability before disposal
            os.fsync(fh.fileno())
        mpath = os.path.join(archive_dir, f"{g}.manifest.json")
        with open(mpath, "w") as fh:
            json.dump({"group": g, "members": manifest}, fh, indent=1)
            fh.flush()
            os.fsync(fh.fileno())
        if dispose:
            for name in members:
                os.remove(os.path.join(src_dir, name))
        report[g] = {
            "files": len(members),
            "bytes": sum(m["bytes"] for m in manifest),
        }
    return report
