"""Acquisition seam for S9 — the pre-landing half of file ingestion.

The reference acquires report files before any Spark work happens: an
IMAP search for the ads-report email (extractors/ingest_files.py:69-93
BingAds, :94-122 GoogleAds), attachment payloads written to the landing
path (:49-68), or a report URL regexed out of the HTML body
(:124-141 ``get_document_url``) and downloaded (:143-151, wget).

That half was previously absent here entirely — the runner started at
the landing directory. This module adds the seam without pulling
network/IMAP into the engine:

- :class:`Fetcher` — the protocol: ``fetch(landing_dir) -> [paths]``;
  anything that can drop report files into a landing directory.
- :class:`MailboxFetcher` — the REAL parsing half of the reference's
  flow over an injected mailbox transport (search → fetch →
  ``email.message.Message``): stdlib ``email`` walking for attachments,
  the reference's CTA-href regex for link-style reports, an injected
  ``url_opener`` for the download. IMAP wiring (``imaplib.IMAP4_SSL``
  + ``uid('search'|'fetch')``) is a 10-line transport a deployment
  supplies; everything testable lives here.
- :class:`DirectoryFetcher` — the local fake: a directory standing in
  for the mailbox (pre-downloaded reports), copied into landing. This
  is what CI and the end-to-end runner test use.

Wiring: ``runner.make_fetching_resolver`` runs a per-table fetcher
before source resolution, so "mailbox → landing → lake" is one
``run_groups`` call.
"""

from __future__ import annotations

import email.message
import fnmatch
import os
import re
import shutil
from collections.abc import Callable, Iterable
from dataclasses import dataclass
from typing import Protocol


class Fetcher(Protocol):
    """Acquire source files into ``landing_dir``; return written paths."""

    def fetch(self, landing_dir: str) -> list[str]: ...


class Mailbox(Protocol):
    """Transport the deployment supplies (imaplib in production, a fake
    in tests): mirrors the reference's two-call IMAP usage
    (``uid('search', ...)`` then ``uid('fetch', uid, '(RFC822)')``,
    ingest_files.py:73-87)."""

    def search(self, sender: str, subject: str) -> list[str]: ...

    def fetch(self, uid: str) -> email.message.Message: ...


# the reference's CTA link regex (ingest_files.py:137); the fallback is
# an anchor whose TEXT is the view-report CTA — never "first href in the
# body", which would download logo/unsubscribe links from ordinary
# marketing HTML
_CTA_RE = re.compile(r'<!-- CTA OUTLOOK END--><a href=([^ >]+)[\s>]')
_VIEW_REPORT_RE = re.compile(
    r'<a\s+href=["\']?([^"\'\s>]+)[^>]*>\s*view\s*report', re.IGNORECASE
)


def _safe_name(name: str) -> str:
    """Attachment filenames come from an untrusted mailbox — keep only
    the basename and a conservative charset so a crafted
    ``../../etc/cron.d/x`` name cannot escape the landing directory.
    Dot-only results ('.', '..') would resolve to directories, so they
    fall back to 'attachment' too."""
    base = os.path.basename(name.replace("\\", "/"))
    base = re.sub(r"[^A-Za-z0-9._-]", "_", base)
    if not base or set(base) == {"."}:
        return "attachment"
    return base


@dataclass
class MailboxFetcher:
    """Search → parse → land, with both of the reference's report
    shapes: multipart attachments (BingAds) and view-report links
    (GoogleAds)."""

    mailbox: Mailbox
    sender: str
    subject: str
    url_opener: Callable[[str], bytes] | None = None
    link_file_prefix: str = "report_"

    def fetch(self, landing_dir: str) -> list[str]:
        os.makedirs(landing_dir, exist_ok=True)
        out: list[str] = []
        # Seed with whatever already landed (yesterday's run): the daily
        # 'report.csv' collision the uid-prefixing exists for happens
        # across runs too, not only within one fetch() call.
        used: set[str] = set(os.listdir(landing_dir))
        for uid in self.mailbox.search(self.sender, self.subject):
            # Cross-run IDEMPOTENCY: an IMAP search by sender+subject
            # returns old messages again on tomorrow's tick. A
            # dot-prefixed per-uid marker (invisible to Spark lake
            # readers, like .staging-*) records "this message already
            # landed once" — without it, the re-seen message would land
            # a second copy under a uid-prefixed name and every row
            # would ingest twice.
            marker = os.path.join(
                landing_dir, f".landed-{_safe_name(str(uid))}"
            )
            if os.path.exists(marker):
                continue
            msg = self.mailbox.fetch(uid)
            out.extend(self._extract(msg, landing_dir, uid, used))
            with open(marker, "w"):
                pass
        return out

    @staticmethod
    def _unique_dest(
        landing_dir: str, name: str, uid: str, used: set[str]
    ) -> str:
        """Daily scheduled reports reuse attachment names across
        messages ('report.csv' every day) — colliding names get the
        message uid (and, if needed, a counter) prefixed instead of
        silently clobbering an earlier report."""
        candidate = name
        if candidate in used:
            candidate = f"{uid}_{name}"
        n = 1
        while candidate in used:
            candidate = f"{uid}_{n}_{name}"
            n += 1
        used.add(candidate)
        return os.path.join(landing_dir, candidate)

    def _extract(
        self,
        msg: email.message.Message,
        landing_dir: str,
        uid: str,
        used: set[str],
    ) -> Iterable[str]:
        written: list[str] = []
        parts = msg.walk() if msg.is_multipart() else [msg]
        for part in parts:
            if part.get_content_maintype() == "multipart":
                continue
            filename = part.get_filename()
            disp = (part.get_content_disposition() or "").lower()
            if filename or disp == "attachment":
                payload = part.get_payload(decode=True)
                if payload is None:
                    continue
                dest = self._unique_dest(
                    landing_dir,
                    _safe_name(filename or f"{uid}.bin"),
                    uid,
                    used,
                )
                with open(dest, "wb") as fp:
                    fp.write(payload)
                written.append(dest)
                continue
            if part.get_content_type() == "text/html":
                url = self._report_url(part)
                if url and self.url_opener is not None:
                    dest = self._unique_dest(
                        landing_dir,
                        f"{self.link_file_prefix}{uid}.csv",
                        uid,
                        used,
                    )
                    with open(dest, "wb") as fp:
                        fp.write(self.url_opener(url))
                    written.append(dest)
        return written

    @staticmethod
    def _report_url(part: email.message.Message) -> str | None:
        payload = part.get_payload(decode=True)
        if payload is None:
            return None
        html = payload.decode("utf-8", "replace")
        html = html.replace("\r\n", "").replace("  ", "")
        m = _CTA_RE.search(html) or _VIEW_REPORT_RE.search(html)
        return m.group(1).strip("\"'") if m else None


@dataclass
class DirectoryFetcher:
    """The local-directory fake of the mailbox: files already
    downloaded to ``source_dir`` are copied into the landing zone —
    what tests (and air-gapped reruns) use in place of IMAP."""

    source_dir: str
    pattern: str = "*"

    def fetch(self, landing_dir: str) -> list[str]:
        os.makedirs(landing_dir, exist_ok=True)
        out: list[str] = []
        for name in sorted(os.listdir(self.source_dir)):
            src = os.path.join(self.source_dir, name)
            if not os.path.isfile(src):
                continue
            if not fnmatch.fnmatch(name, self.pattern):
                continue
            dest = os.path.join(landing_dir, name)
            shutil.copyfile(src, dest)
            out.append(dest)
        return out
