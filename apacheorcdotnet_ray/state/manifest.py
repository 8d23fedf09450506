"""Job manifest: per-partition lineage records enabling checkpoint/resume.

The north rule requires encode jobs to be resumable from per-partition lineage
+ footer metrics. Design (SURVEY.md §4 "Checkpoint/resume"):

- The unit of work is an input *partition* — a (parquet file, row-group range)
  pair, enumerated deterministically from parquet metadata on the driver
  (cheap: footer reads only).
- Each encode task writes its stripes plus one lineage record; the driver
  appends completed records to ``manifest.jsonl`` in the output directory.
- Resume = re-enumerate partitions, drop the ones already recorded with a
  matching fingerprint, run only the remainder. Stripe files are
  content-hash-named, so a partially-completed partition that reruns simply
  overwrites its own files — the final manifest is byte-identical to a
  single-shot run's.
"""

from __future__ import annotations

import json
import os


class Manifest:
    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.path = os.path.join(out_dir, "manifest.jsonl")

    def completed_partitions(self) -> dict[str, dict]:
        """partition_id → record, for records already durably completed."""
        done: dict[str, dict] = {}
        if os.path.exists(self.path):
            with open(self.path) as f:
                for line in f:
                    line = line.strip()
                    if not line:
                        continue
                    rec = json.loads(line)
                    done[rec["partition_id"]] = rec
        return done

    def append(self, records: list[dict]) -> None:
        os.makedirs(self.out_dir, exist_ok=True)
        with open(self.path, "a") as f:
            for rec in records:
                f.write(json.dumps(rec, sort_keys=True) + "\n")

    def finalize(self, summary: dict) -> None:
        """Write job-level footer metrics (file-stats roll-up) atomically."""
        p = os.path.join(self.out_dir, "job_summary.json")
        with open(p + ".tmp", "w") as f:
            json.dump(summary, f, indent=2, sort_keys=True)
        os.replace(p + ".tmp", p)

    def rewrite_sorted(self) -> None:
        """Canonicalize record order so resumed and single-shot runs produce
        byte-identical manifests."""
        done = self.completed_partitions()
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            for pid in sorted(done):
                f.write(json.dumps(done[pid], sort_keys=True) + "\n")
        os.replace(tmp, self.path)
