"""ANSI-styled terminal messages and section headers.

Parity target: fl_tissue_model_tools/colored_messages.py:8-28 and the section
header/footer helpers in script_util.py:17-37.
"""

from __future__ import annotations

import shutil
from dataclasses import dataclass


@dataclass
class SFM:
    """Colored terminal message tags (same tag vocabulary as the reference)."""

    red = "\x1b[38;5;1m\x1b[1m"
    green = "\x1b[38;5;2m\x1b[1m"
    cyan = "\x1b[38;5;6m\x1b[1m"
    purple = "\x1b[38;5;5m\x1b[1m"
    yellow = "\x1b[38;5;3m\x1b[1m"
    blue = "\x1b[38;5;4m\x1b[1m"
    bold = "\x1b[1m"
    reset = "\x1b[0m"
    success = f"{green}[SUCCESS]{reset}"
    failure = f"{red}[FAILURE]{reset}"
    warning = f"{yellow}[WARNING]{reset}"
    info = f"{blue}[INFO]{reset}"
    all_succeeded = f"{green}[ALL SUCCEEDED]{reset}"
    failures_present = f"{red}[FAILURES PRESENT]{reset}"

    @classmethod
    def highlight(cls, cmd: str) -> str:
        return f"{cls.purple}{cmd}{cls.reset}"


def _term_width(default: int = 80) -> int:
    try:
        return shutil.get_terminal_size().columns
    except Exception:
        return default


def section_header(title: str) -> None:
    width = max(len(title) + 4, min(_term_width(), 80))
    print("", flush=True)
    print("=" * width, flush=True)
    print(f"| {title}", flush=True)
    print("=" * width, flush=True)


def section_footer() -> None:
    print("=" * min(_term_width(), 80), flush=True)
    print("", flush=True)


END_SEPARATOR = "=" * 80
