"""Secrets provider (SURVEY.md §2.1 S11, §2.12 E9).

The reference reads Databricks Key-Vault-backed secrets with fail-fast
validation (databricks/talkdesk_databricks_etl.py:35-73). The engine
uses a provider-agnostic interface: environment variables (optionally
file-backed for mounted secrets), with the same fail-fast check on
missing keys.
"""

from __future__ import annotations

import os
from pathlib import Path


class MissingSecretError(Exception):
    pass


class EnvSecretsProvider:
    """``get('client-id')`` → env var ``TDE_CLIENT_ID`` (or
    ``{prefix}_CLIENT_ID``), else a file under ``secrets_dir``."""

    def __init__(self, prefix: str = "TDE", secrets_dir: str | None = None):
        self.prefix = prefix
        self.secrets_dir = secrets_dir

    def get(self, key: str) -> str:
        env_key = f"{self.prefix}_{key.upper().replace('-', '_')}"
        val = os.environ.get(env_key)
        if val:
            return val
        if self.secrets_dir:
            p = Path(self.secrets_dir) / key
            if p.exists():
                return p.read_text(encoding="utf-8").strip()
        raise MissingSecretError(f"secret {key!r} not found (env {env_key})")

    def load_required(self, keys: tuple[str, ...]) -> dict[str, str]:
        """Fail-fast on ANY missing key before the job starts
        (reference DB:58-67)."""
        missing = []
        out: dict[str, str] = {}
        for k in keys:
            try:
                out[k] = self.get(k)
            except MissingSecretError:
                missing.append(k)
        if missing:
            raise MissingSecretError(f"missing required secrets: {missing}")
        return out
