"""Per-unit lineage manifests + commit log for checkpoint resume.

Spark analog of the reference's blockfmt descriptors + FileTree input
dedup: every ingested object is recorded in the table index so a
re-run skips already-converted inputs
(/root/reference/ion/blockfmt/index.go:115-145,
/root/reference/db/sync.go:366-430).

Layout under the pipeline output directory:

    out/
      routed/unit=<unit_id>/sink_id=<sink>/*.parquet   (data)
      manifests/<unit_id>.json                          (lineage)
      _commit.log                                       (append-only)

A unit is only *committed* once its manifest file exists; the manifest
is written via tmp-file + atomic rename AFTER the unit's data write
succeeded, so a killed job can never leave a committed-but-partial
unit.  Data for an uncommitted unit is overwritten wholesale on retry
(idempotent overwrite into the unit's own directory), which is what
makes resume exactly-once: no committed unit is reprocessed, no
uncommitted unit can double-count.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import asdict, dataclass, field
from typing import Any


@dataclass
class UnitManifest:
    """Lineage record for one committed unit of input."""

    unit_id: str
    inputs: list[str]                  # input files (with sizes) making up the unit
    input_bytes: int
    rows_in: int
    rows_routed: int
    per_sink_rows: dict[str, int]
    per_partition_rows: dict[str, int]  # spark partition id -> rows (lineage)
    wall_ms: float
    # file-identity fingerprint [basename, size, mtime_ns] per input:
    # an input rewritten in place (same name, new content) must not be
    # treated as committed — the FileTree ETag/mtime identity check
    # (/root/reference/db/sync.go:366-430).  Empty on legacy manifests,
    # which fall back to basename-only comparison.
    input_identity: list = field(default_factory=list)
    committed_at: float = field(default_factory=time.time)
    extra: dict[str, Any] = field(default_factory=dict)


def file_identity(paths: list[str]) -> list:
    """Sorted [basename, size, mtime_ns] fingerprint for a file list."""
    out = []
    for p in paths:
        st = os.stat(p)
        out.append([os.path.basename(p), st.st_size, st.st_mtime_ns])
    return sorted(out)


class LineageLog:
    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.manifest_dir = os.path.join(out_dir, "manifests")
        self.commit_log = os.path.join(out_dir, "_commit.log")
        os.makedirs(self.manifest_dir, exist_ok=True)

    def committed_units(self) -> set[str]:
        return {
            f[: -len(".json")]
            for f in os.listdir(self.manifest_dir)
            if f.endswith(".json")
        }

    def is_committed(self, unit_id: str, inputs: list[str] | None = None) -> bool:
        """A unit only counts as committed if its manifest exists AND
        (when `inputs` is given) the manifest's recorded input identity
        — (basename, size, mtime_ns) per file — matches the unit's
        current files: an input rewritten in place with the same name
        must be reprocessed (the FileTree-identity check,
        /root/reference/db/sync.go:366-430).  Manifests written before
        input_identity existed fall back to basename-only comparison."""
        path = os.path.join(self.manifest_dir, f"{unit_id}.json")
        if not os.path.exists(path):
            return False
        if inputs is None:
            return True
        try:
            m = self.read_manifest(unit_id)
        except (OSError, ValueError, TypeError):
            return False
        if m.input_identity:
            try:
                current = file_identity(inputs)
            except OSError:
                return False
            return [list(e) for e in m.input_identity] == current
        return sorted(os.path.basename(f) for f in m.inputs) == sorted(
            os.path.basename(f) for f in inputs
        )

    def commit(self, manifest: UnitManifest) -> None:
        """Atomically publish the manifest, then append the commit log."""
        final = os.path.join(self.manifest_dir, f"{manifest.unit_id}.json")
        tmp = final + ".tmp"
        with open(tmp, "w") as f:
            json.dump(asdict(manifest), f, indent=1, sort_keys=True)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, final)
        with open(self.commit_log, "a") as f:
            f.write(f"{manifest.committed_at:.6f}\t{manifest.unit_id}\t"
                    f"{manifest.rows_in}\t{manifest.rows_routed}\n")

    def read_manifest(self, unit_id: str) -> UnitManifest:
        with open(os.path.join(self.manifest_dir, f"{unit_id}.json")) as f:
            return UnitManifest(**json.load(f))

    def total_stats(self) -> dict[str, int]:
        """ExecStats analog (/root/reference/plan/stats.go:28-60)."""
        rows_in = rows_routed = input_bytes = 0
        for uid in self.committed_units():
            m = self.read_manifest(uid)
            rows_in += m.rows_in
            rows_routed += m.rows_routed
            input_bytes += m.input_bytes
        return {
            "units": len(self.committed_units()),
            "rows_in": rows_in,
            "rows_routed": rows_routed,
            "input_bytes": input_bytes,
        }
