"""``${VAR}`` environment substitution over config trees (SURVEY §2.5 T8).

Reimplements the reference's helper (``kafka_publisher.py:225-245``,
duplicated at ``s3_connector_deployer.py:15-35``): recurse through
dict / list / str, replacing every ``${NAME}`` occurrence in strings
with ``os.environ[NAME]``. Reference semantics are preserved exactly:

- an unset variable leaves the ``${NAME}`` literal in place (the
  reference logs a warning and continues);
- non-str scalars (int, bool, None, ...) pass through untouched;
- substitution is plain text replacement — no escaping, no nesting.

Not a data-plane operator; used by the REST façade / connector-style
config loading.
"""

from __future__ import annotations

import logging
import os
import re

logger = logging.getLogger(__name__)

_PATTERN = re.compile(r"\$\{([^}]+)\}")


def substitute_env_vars(config):
    """Replace ``${VAR}`` with the environment value throughout a
    nested dict/list/str config tree; unknown vars stay literal."""
    if isinstance(config, dict):
        return {k: substitute_env_vars(v) for k, v in config.items()}
    if isinstance(config, list):
        return [substitute_env_vars(v) for v in config]
    if isinstance(config, str):
        result = config
        for match in _PATTERN.finditer(config):
            name = match.group(1)
            value = os.environ.get(name)
            if value is None:
                logger.warning("Environment variable %s not found", name)
                continue
            result = result.replace("${%s}" % name, value)
        return result
    return config
