"""File-attachment storage sink/source (SURVEY §2.1 S5-S7).

The reference stores attachment bytes on local disk under a date hierarchy
``YYYY/MM/DD/<base>_<epochms>_<rand4><ext>`` (``src/server/FileStorage.cpp:
13-71``, path gen ``:134-143``, unique-name gen ``:96-132``). Here the
storage root is any filesystem path (object-store mount at scale); names use
a UUID suffix instead of epoch+rand — same uniqueness contract, no clock
dependency. Reads at scale go through ``spark.read.format("binaryFile")``
(see sources/multimodal.py); the byte-level helpers below are the
engine-API path.
"""

from __future__ import annotations

import datetime as _dt
import os
import uuid


def storage_rel_path(orig_name: str, when: _dt.date | None = None,
                     token: str | None = None) -> str:
    """Date-partitioned unique relative path (``FileStorage.cpp:96-143``).
    ``when``/``token`` injectable for deterministic tests."""
    when = when or _dt.date.today()
    base, ext = os.path.splitext(os.path.basename(orig_name))
    token = token or uuid.uuid4().hex[:8]
    return f"{when:%Y/%m/%d}/{base}_{token}{ext.lower()}"


def save_file(root: str, orig_name: str, content: bytes,
              when: _dt.date | None = None, token: str | None = None) -> str:
    """S5: write bytes under the date hierarchy, return the relative path."""
    rel = storage_rel_path(orig_name, when, token)
    full = os.path.join(root, rel)
    os.makedirs(os.path.dirname(full), exist_ok=True)
    with open(full, "wb") as f:
        f.write(content)
    return rel


def _resolve_under_root(root: str, rel_path: str) -> str:
    """Resolve ``root/rel_path`` and require it to stay under ``root``.

    Table-stored paths flow into read/delete (delete_node cascades via
    node_files rows), so ``..`` traversal or an absolute rel_path — which
    ``os.path.join`` would silently let escape the storage root — must be
    rejected, not honored."""
    rootr = os.path.realpath(root)
    full = os.path.realpath(os.path.join(rootr, rel_path))
    if full != rootr and not full.startswith(rootr + os.sep):
        raise ValueError(f"storage path escapes root: {rel_path!r}")
    return full


def read_file(root: str, rel_path: str) -> bytes:
    """S6 (``FileStorage.cpp:73-82``); rel_path confined to root."""
    with open(_resolve_under_root(root, rel_path), "rb") as f:
        return f.read()


def delete_file(root: str, rel_path: str) -> bool:
    """S7 (``FileStorage.cpp:84-86``); True if removed. rel_path confined to
    root."""
    try:
        os.remove(_resolve_under_root(root, rel_path))
        return True
    except FileNotFoundError:
        return False
