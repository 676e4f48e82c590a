"""Run notification (SURVEY.md §2.1 S5).

The reference tails every sync with a Gmail send of the log file
(outreach_etl.py:237-243, etl_tools.py:83-171 — OAuth browser flow,
MIME attachment). That is an operational side-channel, not a query
operator; the engine models it as a pluggable interface with a
logging default, so a deployment can attach email/Slack/pager
implementations without the engine importing any of their SDKs.
"""

from __future__ import annotations

import logging
from typing import Protocol

logger = logging.getLogger("outreach_etl_tool_spark")


class Notifier(Protocol):
    def notify(self, subject: str, body: str) -> None: ...


class LogNotifier:
    """Default: structured log line (stdout/file via logging config)."""

    def notify(self, subject: str, body: str) -> None:
        logger.info("notify: %s — %s", subject, body)


class EmailNotifier:
    """Reference-parity email notification. STUB: this environment has
    no mail transport; wire an SMTP/Gmail client here in deployment."""

    def __init__(self, recipient: str) -> None:
        self.recipient = recipient

    def notify(self, subject: str, body: str) -> None:
        raise NotImplementedError(
            "no mail transport in this environment; subclass Notifier "
            "with your SMTP/Gmail client"
        )
