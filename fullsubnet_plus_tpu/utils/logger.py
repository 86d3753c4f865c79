"""File + console logger (reference utils/logger.py:13-52).

Timestamped lines to console and an optional log file; optional Slack
webhook fire-and-forget (the reference posts from a thread — we keep the
same surface but it is a no-op without a URL). Unlike the reference we do
not monkey-patch builtins.print; call `log` explicitly.
"""

from __future__ import annotations

import json
import os
import threading
from datetime import datetime
from urllib.request import Request, urlopen

_file = None
_run_name = None
_slack_url = None
_lock = threading.Lock()


def init(filename: str | None, run_name: str | None = None, slack_url: str | None = None):
    """(Re)configure the logger; `filename=None` detaches any open log file."""
    global _file, _run_name, _slack_url
    with _lock:
        if _file is not None:
            _file.close()
            _file = None
        if filename:
            os.makedirs(os.path.dirname(os.path.abspath(filename)) or ".", exist_ok=True)
            _file = open(filename, "a")
    _run_name = run_name
    _slack_url = slack_url


def log(*args):
    msg = " ".join(str(a) for a in args)
    stamp = datetime.now().strftime("%Y-%m-%d %H:%M:%S.%f")
    line = f"[{stamp}] {msg}"
    with _lock:
        print(line, flush=True)
        if _file is not None:
            _file.write(line + "\n")
            _file.flush()
    if _slack_url:
        threading.Thread(target=_post_slack, args=(msg,), daemon=True).start()


def _post_slack(msg: str):
    try:
        payload = json.dumps(
            {"text": f"{_run_name}: {msg}" if _run_name else msg}
        ).encode()
        req = Request(_slack_url, data=payload, headers={"Content-Type": "application/json"})
        urlopen(req, timeout=5)
    except Exception:
        pass  # logging must never take down training
