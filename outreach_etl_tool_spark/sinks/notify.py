"""Run notification (SURVEY.md §2.1 S5).

The reference tails every sync with a Gmail send of the run log
(outreach_etl.py:237-243; etl_tools.py:114-171 builds a MIME message
from sender/to/subject/body plus one file attachment and posts it via
an OAuth'd Gmail client, etl_tools.py:83-112). That is an operational
side-channel, not a query operator; the engine models the MESSAGE as
data (`Message`, same fields as the reference's
SendMessageWithAttachment signature) and the SEND as a pluggable
transport callable — so the reference's behavior is runnable and
testable here through file/in-memory transports, and a deployment
attaches a real SMTP/Gmail callable without the engine importing any
mail SDK.
"""

from __future__ import annotations

import json
import logging
from dataclasses import asdict, dataclass, field
from pathlib import Path
from typing import Callable, Protocol

logger = logging.getLogger("outreach_etl_tool_spark")


@dataclass(frozen=True)
class Message:
    """One notification, mirroring the reference's send arguments
    (etl_tools.py:114-130: sender, to, subject, message_text,
    file_dir/filename attachment)."""

    sender: str
    to: str
    subject: str
    body: str
    attachment_path: str | None = None

    def attachment_bytes(self) -> bytes | None:
        if self.attachment_path is None:
            return None
        return Path(self.attachment_path).read_bytes()


# A transport consumes a fully-built Message. Implementations decide
# delivery: append to a list (tests), write an outbox file (ops), post
# to SMTP/Gmail (deployment).
Transport = Callable[[Message], None]


class MemoryTransport:
    """In-memory outbox — the test seam."""

    def __init__(self) -> None:
        self.sent: list[Message] = []

    def __call__(self, message: Message) -> None:
        self.sent.append(message)


class FileTransport:
    """Durable outbox: one JSON file per message under `outbox_dir`,
    attachment content inlined so the outbox is self-contained even
    if the run log is rotated away afterwards."""

    def __init__(self, outbox_dir: str) -> None:
        self.outbox_dir = Path(outbox_dir)
        self.outbox_dir.mkdir(parents=True, exist_ok=True)
        # resume past the highest existing message so a second transport
        # pointed at the same outbox appends instead of overwriting
        self._seq = max(
            (
                int(p.stem.split("_")[1])
                for p in self.outbox_dir.glob("msg_*.json")
                if p.stem.split("_")[1].isdigit()
            ),
            default=0,
        )

    def __call__(self, message: Message) -> None:
        payload = asdict(message)
        att = message.attachment_bytes()
        if att is not None:
            payload["attachment_content"] = att.decode("utf-8", "replace")
        self._seq += 1
        out = self.outbox_dir / f"msg_{self._seq:06d}.json"
        out.write_text(json.dumps(payload, indent=1))


class Notifier(Protocol):
    def notify(self, subject: str, body: str) -> None: ...


class LogNotifier:
    """Default: structured log line (stdout/file via logging config)."""

    def notify(self, subject: str, body: str) -> None:
        logger.info("notify: %s — %s", subject, body)


@dataclass
class EmailNotifier:
    """Reference-parity email notification through a transport seam.

    With no transport this raises on use (this environment has no mail
    client — the Gmail OAuth flow of etl_tools.py:83-112 belongs in a
    deployment-provided callable); with one, it builds the same
    sender/to/subject/body(+log attachment) message the reference
    sends after every sync."""

    sender: str
    recipient: str
    transport: Transport | None = None
    run_log_path: str | None = None
    sent_count: int = field(default=0, init=False)

    def notify(self, subject: str, body: str) -> None:
        if self.transport is None:
            raise NotImplementedError(
                "no mail transport in this environment; pass transport= "
                "(any Callable[[Message], None] — SMTP, Gmail, Slack)"
            )
        self.transport(
            Message(
                sender=self.sender,
                to=self.recipient,
                subject=subject,
                body=body,
                attachment_path=self.run_log_path,
            )
        )
        self.sent_count += 1


def notify_run_log(
    notifier: Notifier, run_name: str, log_path: str | None = None
) -> None:
    """The reference's end-of-sync behavior (outreach_etl.py:237-243):
    one notification per run, subject = run name, body + attached run
    log. Works with any Notifier; EmailNotifier picks up `log_path`
    as the attachment when it was constructed with run_log_path."""
    tail = ""
    if log_path is not None:
        try:
            tail = Path(log_path).read_text()[-2000:]
        except OSError:
            tail = f"(run log unreadable: {log_path})"
    notifier.notify(f"run complete: {run_name}", tail or "run complete")
