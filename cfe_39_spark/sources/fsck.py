"""Table integrity checker (the `fsck` / Iceberg-maintenance validation
role): walk a SequenceTable's metadata and report every broken invariant
as a typed finding instead of letting readers discover corruption as a
confusing failure deep inside a Spark job.

Checks are metadata-shaped and bounded:

* pointer + chain: `_LATEST` resolves, parses, and the parent chain walks
  to its root without missing descriptors;
* manifests: every manifest segment of the checked snapshot parses, and
  every data AND changelog file it references EXISTS on storage
  (existence probes fan out on a thread pool — object-store HEADs,
  O(live files), the one intentionally file-proportional check; missing
  changelog files get their own ``change_file_missing`` code since they
  break read_changes / the streaming feed, not table reads — and because
  read_changes serves the whole RETAINED span, every retained snapshot's
  change files are probed, not just the tip's);
* entry invariants: `bucket < spec_nb`, live spec divisibility (every
  file's `spec_nb` divides the table's current `n_buckets` — the
  contract every bucket-pruning site relies on), non-negative row counts;
* refs: every tag and branch points at an existing descriptor;
* idempotency layer: the checked snapshot's batch marker exists and
  agrees with `batches.log` (crash-heal left nothing half-written);
* schema registry: the current version is registered and its field-id
  map covers exactly the schema's columns;
* layout properties: `sort_order` / `bloom_filter` / `zorder` columns
  all exist in the current schema (tables written before the round-4
  DDL/layout sync can carry a dangling name that breaks the next write
  — fsck flags it BEFORE a write dies on it);
* `deep=True` adds a footer pass: each file's parquet row count must
  match its manifest `rows` stamp (threadpooled footer reads, no data
  scan).

Returns an `FsckReport`; `report.ok` is True when nothing ERROR-level
surfaced (INFO findings — e.g. legacy entries predating newer manifest
keys — do not fail the check).
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field

from . import fs
from .table import SequenceTable


@dataclass
class Finding:
    level: str  # "error" | "warn" | "info"
    code: str
    message: str


@dataclass
class FsckReport:
    table: str
    snapshot_id: int | None = None
    files_checked: int = 0
    findings: "list[Finding]" = field(default_factory=list)

    @property
    def ok(self) -> bool:
        return not any(f.level == "error" for f in self.findings)

    def add(self, level: str, code: str, message: str) -> None:
        self.findings.append(Finding(level, code, message))

    def to_dict(self) -> dict:
        return {
            "table": self.table,
            "snapshot_id": self.snapshot_id,
            "files_checked": self.files_checked,
            "ok": self.ok,
            "findings": [vars(f) for f in self.findings],
        }


def check_table(table: SequenceTable, deep: bool = False) -> FsckReport:
    """Run every check against the table's CURRENT committed state."""
    rep = FsckReport(table.root)

    # -- pointer + chain ------------------------------------------------ #
    try:
        head = table.latest_snapshot_id()
        snap = table.snapshot(head)
        rep.snapshot_id = head
    except Exception as e:  # noqa: BLE001 — fsck reports, never raises
        rep.add("error", "pointer", f"_LATEST does not resolve: {e}")
        return rep
    sid = snap["parent_id"]
    seen = {head}
    while sid is not None:
        if sid in seen:
            rep.add("error", "chain_cycle", f"parent chain revisits snapshot {sid}")
            break
        seen.add(sid)
        try:
            sid = table.snapshot(sid)["parent_id"]
        except Exception as e:  # noqa: BLE001
            rep.add("error", "chain_break",
                    f"snapshot {sid} unreadable while walking parents: {e}")
            break

    # -- schema registry ------------------------------------------------ #
    # the layout check needs the current schema's names; when the schema
    # itself is unreadable (the corruption just reported), fsck must not
    # die on it — "fsck reports, never raises" — so the names computation
    # lives INSIDE the guarded branch and the layout check is skipped with
    # an info finding instead
    sv = str(snap["schema_version"])
    if sv not in snap["schemas"]:
        rep.add("error", "schema_unregistered",
                f"current schema_version {sv} missing from the registry")
        rep.add("info", "layout_check_skipped",
                "layout-properties check skipped: current schema is "
                "unreadable (see schema_unregistered)")
    else:
        names = {f.name for f in table.user_schema(snap).fields}
        fids = (snap.get("field_ids") or {}).get(sv)
        if fids is not None and set(fids) != names:
            rep.add("error", "field_ids_mismatch",
                    f"field-id map covers {sorted(fids)} but schema has "
                    f"{sorted(names)}")

        # -- layout properties ------------------------------------------ #
        for prop, cols in (
            ("sort_order", snap.get("sort_order") or []),
            ("bloom_filter", (snap.get("bloom_filter") or {}).get("cols", [])),
            ("zorder", (snap.get("zorder") or {}).get("cols", [])),
        ):
            dangling = [c for c in cols if c not in names]
            if dangling:
                rep.add("error", "layout_dangling",
                        f"{prop} references missing column(s) {dangling} — the "
                        "next write will fail; re-point or drop the property "
                        "(tables written before the DDL/layout sync can carry this)")

    # -- file entries ---------------------------------------------------- #
    try:
        entries = snap["files"]  # lazily concatenates manifest segments
    except Exception as e:  # noqa: BLE001
        rep.add("error", "manifest_unreadable",
                f"a manifest segment of snapshot {head} is missing or "
                f"corrupt: {e}")
        return rep
    nb = int(snap["n_buckets"])
    for e in entries:
        spec = int(e.get("spec_nb", nb))
        if nb % spec != 0:
            rep.add("error", "spec_divisibility",
                    f"{e['path']}: spec_nb {spec} does not divide current "
                    f"n_buckets {nb} — bucket pruning is unsound for it")
        if not (0 <= int(e["bucket"]) < spec):
            rep.add("error", "bucket_range",
                    f"{e['path']}: bucket {e['bucket']} outside [0, {spec})")
        if int(e["rows"]) < 0:
            rep.add("error", "rows_negative", f"{e['path']}: rows {e['rows']}")

    # change files are read paths too (read_changes, the streaming change
    # feed): a vanished changelog file would pass a data-only probe clean
    # and then break consumers at read time — probe them alongside, with a
    # distinct finding code so the operator knows which surface breaks
    change_entries = list(snap.get("change_files") or [])

    def probe(ek: "tuple[dict, str]") -> "tuple[dict, str, bool]":
        e, code = ek
        return e, code, fs.exists(os.path.join(table.root, e["path"]))

    probes = [(e, "file_missing") for e in entries] + [
        (e, "change_file_missing") for e in change_entries
    ]
    with ThreadPoolExecutor(max_workers=min(16, max(1, len(probes)))) as pool:
        for e, code, present in pool.map(probe, probes):
            rep.files_checked += 1
            if not present:
                kind = "changelog" if code == "change_file_missing" else "data"
                rep.add("error", code,
                        f"manifest references missing {kind} file {e['path']}")

    # -- refs ------------------------------------------------------------ #
    refs = table._read_refs()
    for kind in ("tags", "branches"):
        for name, v in (refs.get(kind) or {}).items():
            rsid = table._ref_sid(v)
            if not fs.exists(table._snap_path(rsid)):
                rep.add("error", "ref_dangling",
                        f"{kind[:-1]} {name!r} points at missing snapshot {rsid}")

    # -- idempotency layer ---------------------------------------------- #
    bid = snap["batch_id"]
    marked = table._read_marker(bid)
    if marked is None:
        rep.add("warn", "marker_missing",
                f"no batch marker for head batch {bid!r} (GC'd markers are "
                "legal; replay of this id would re-commit)")
    elif marked != head:
        rep.add("error", "marker_mismatch",
                f"marker for {bid!r} says snapshot {marked}, head is {head}")

    # -- orphan data dirs (info) ----------------------------------------- #
    # read-only mirror of expire_snapshots' reachability sweep: a commit
    # dir referenced by NO on-disk descriptor is a crash leftover or an
    # in-flight commit that staged before taking the lock — report it,
    # never touch it (the expiry GC owns deletion, with its grace window)
    referenced: set[str] = set()
    # historical change files ride this same walk: read_changes serves
    # the WHOLE retained snapshot span, so a changelog file lost from any
    # older snapshot breaks the change feed even when the tip is clean —
    # collect every retained snapshot's change entries for the probe below
    hist_change: dict[str, int] = {}
    for f in fs.listdir(table.meta_dir):
        if not f.startswith("snap-"):
            continue
        try:
            hsid = int(f[5:-5])
            s = table.snapshot(hsid)
            for e in s["files"] + (s.get("change_files") or []):
                referenced.add(
                    os.path.dirname(os.path.dirname(
                        os.path.join(table.root, e["path"])))
                )
            for e in s.get("change_files") or []:
                hist_change.setdefault(e["path"], hsid)
        except Exception:  # noqa: BLE001 — unreadable snaps already reported
            continue
    probed = {e["path"] for e in change_entries}
    hist_probes = sorted(p for p in hist_change if p not in probed)

    def probe_hist(pth: str) -> "tuple[str, bool]":
        return pth, fs.exists(os.path.join(table.root, pth))

    if hist_probes:
        with ThreadPoolExecutor(max_workers=min(16, len(hist_probes))) as pool:
            for pth, present in pool.map(probe_hist, hist_probes):
                rep.files_checked += 1
                if not present:
                    rep.add("error", "change_file_missing",
                            f"snapshot {hist_change[pth]} references missing "
                            f"changelog file {pth} — read_changes / the "
                            "streaming change feed break on this span")
    orphans, orphan_bytes = 0, 0
    try:
        data_dirs = fs.listdir(table.data_dir)
    except FileNotFoundError:
        data_dirs = []
    for d in data_dirs:
        full = os.path.join(table.data_dir, d)
        if full in referenced:
            continue
        orphans += 1
        for root_, _, fns in os.walk(full):
            orphan_bytes += sum(
                os.path.getsize(os.path.join(root_, fn)) for fn in fns
            )
    if orphans:
        rep.add("info", "orphan_data_dirs",
                f"{orphans} commit dir(s) ({orphan_bytes} bytes) referenced "
                "by no snapshot — crash leftovers or an in-flight commit; "
                "expire_snapshots reclaims them after its grace window")

    # -- deep: footer row counts (data + change files) ------------------- #
    deep_entries = entries + change_entries
    if deep and deep_entries:
        import pyarrow.parquet as pq

        def rows_of(e: dict) -> "tuple[dict, int | None]":
            try:
                return e, pq.ParquetFile(
                    os.path.join(table.root, e["path"])
                ).metadata.num_rows
            except Exception:  # noqa: BLE001 — missing already reported
                return e, None

        with ThreadPoolExecutor(max_workers=min(16, len(deep_entries))) as pool:
            for e, n in pool.map(rows_of, deep_entries):
                if n is not None and n != int(e["rows"]):
                    rep.add("error", "rows_mismatch",
                            f"{e['path']}: manifest says {e['rows']} rows, "
                            f"footer says {n}")
    return rep
