"""Remote-storage connector interface.

The reference hardcodes Box + Cerberus inside the pipeline
(box_ingest.py:22-35, with the same secret fetched six times, and a
folder/file API threaded through every helper). Here the connector is
an injected interface so pipelines are testable without network and
portable across stores. Two deliberate behavior fixes over the
reference, both documented in SURVEY.md §2.2:

- deletion works on the file ids captured at download time, not a
  re-listing (the reference re-lists and may delete files that arrived
  after the download — box_ingest.py:65-83);
- the latest-file sort uses the created_at already present in the
  listing instead of one extra API call per file (box_ingest.py:47).
"""

from __future__ import annotations

import os
import re
import shutil
from abc import ABC, abstractmethod
from dataclasses import dataclass


@dataclass(frozen=True)
class RemoteFile:
    """One entry of a remote folder listing."""

    id: str
    name: str
    created_at: str  # ISO-8601 sortable string
    size: int = 0


class Connector(ABC):
    """Minimal surface the ingest/export pipelines need."""

    @abstractmethod
    def list_folder(self, folder_id: str) -> list[RemoteFile]: ...

    @abstractmethod
    def download(self, file: RemoteFile, dest_path: str) -> None: ...

    @abstractmethod
    def upload(self, folder_id: str, name: str, local_path: str) -> None:
        """Upsert: replace the same-named file if present, else create
        (reference box_export.py:50-69)."""

    @abstractmethod
    def delete(self, file: RemoteFile) -> None: ...


def select_files(
    files: list[RemoteFile], name_regex: str, latest: bool = False
) -> list[RemoteFile]:
    """Anchored-at-start regex match (``re.match`` semantics, reference
    box_ingest.py:40), optional newest-only (box_ingest.py:44-50)."""
    matched = [f for f in files if re.match(name_regex, f.name)]
    if not matched:
        return []
    if latest:
        matched = [max(matched, key=lambda f: (f.created_at, f.id))]
    return matched


class LocalFSConnector(Connector):
    """Directory-backed connector: folder_id is a directory path.

    The test double for Box, and a real connector for landing-zone
    directories (NFS mount, fuse-mounted object store)."""

    def list_folder(self, folder_id: str) -> list[RemoteFile]:
        out = []
        for entry in sorted(os.listdir(folder_id)):
            p = os.path.join(folder_id, entry)
            if os.path.isfile(p):
                stat = os.stat(p)
                out.append(
                    RemoteFile(
                        id=p,
                        name=entry,
                        created_at=f"{stat.st_mtime:020.6f}",
                        size=stat.st_size,
                    )
                )
        return out

    def download(self, file: RemoteFile, dest_path: str) -> None:
        shutil.copyfile(file.id, dest_path)

    def upload(self, folder_id: str, name: str, local_path: str) -> None:
        os.makedirs(folder_id, exist_ok=True)
        shutil.copyfile(local_path, os.path.join(folder_id, name))

    def delete(self, file: RemoteFile) -> None:
        os.remove(file.id)


class BoxConnector(Connector):
    """Box connector matching the reference's integration surface.

    Requires the ``boxsdk`` package (not installed in this
    environment); construction fails fast with guidance. Unlike the
    reference, credentials are passed in (one secret fetch, no
    hardcoded vault path — box_ingest.py:22-35)."""

    def __init__(self, jwt_settings: dict):
        try:
            from boxsdk import Client, JWTAuth  # type: ignore
        except ImportError as exc:  # pragma: no cover
            raise NotImplementedError(
                "BoxConnector requires the 'boxsdk' package; inject a "
                "LocalFSConnector (or any Connector impl) instead"
            ) from exc
        auth = JWTAuth(**jwt_settings)  # pragma: no cover
        self._client = Client(auth)  # pragma: no cover

    # pragma: no cover — network calls, exercised only with boxsdk
    def list_folder(self, folder_id: str) -> list[RemoteFile]:
        items = self._client.folder(folder_id).get_items(
            fields=["id", "name", "created_at", "size"]
        )
        return [
            RemoteFile(
                id=i.id,
                name=i.name,
                created_at=getattr(i, "created_at", "") or "",
                size=getattr(i, "size", 0) or 0,
            )
            for i in items
        ]

    def download(self, file: RemoteFile, dest_path: str) -> None:
        with open(dest_path, "wb") as fh:
            self._client.file(file.id).download_to(fh)

    def upload(self, folder_id: str, name: str, local_path: str) -> None:
        existing = [
            f for f in self.list_folder(folder_id) if f.name == name
        ]
        if existing:
            self._client.file(existing[0].id).update_contents(local_path)
        else:
            self._client.folder(folder_id).upload(local_path, file_name=name)

    def delete(self, file: RemoteFile) -> None:
        self._client.file(file.id).delete()
