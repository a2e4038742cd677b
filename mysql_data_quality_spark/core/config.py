"""Env / ``.env``-driven configuration.

Mirrors the reference's config layer
(``/root/reference/src/data_quality/config.py:20-106`` + ``.env.example``):
``.env`` file loading, app settings, and the duplicate-validation
skip/force lists — re-expressed as plain dataclasses (no pydantic in this
runtime) plus a quality-filter extension: per-rule threshold / enable
overrides so the whole pipeline can be driven from environment alone
(``DQS_RULE_<NAME>`` / ``DQS_RULE_<NAME>_ENABLED``).

Env names for the duplicate lists are the reference's own
(``SKIP_DUPLICATE_PATTERNS``, ``FORCE_UNIQUE_PATTERNS``,
``FORCE_UNIQUE_COLUMNS``, ``ALLOW_DUPLICATE_COLUMNS`` —
``.env.example:22-37``) so a reference user's ``.env`` keeps working.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field, replace
from pathlib import Path
from typing import Mapping, Optional

from mysql_data_quality_spark.validators.duplicates import (
    DEFAULT_FORCE_PATTERNS,
    DEFAULT_SKIP_PATTERNS,
)


def load_dotenv(path: str | Path = ".env", override: bool = False) -> dict:
    """Tiny ``.env`` loader (KEY=VALUE lines; #-comments and blanks ignored;
    surrounding single/double quotes stripped).  Returns what was loaded.
    Existing process env wins unless ``override=True`` — same precedence as
    the reference's python-dotenv usage (config.py:95-99)."""
    p = Path(path)
    loaded: dict[str, str] = {}
    if not p.exists():
        return loaded
    for line in p.read_text().splitlines():
        line = line.strip()
        if not line or line.startswith("#") or "=" not in line:
            continue
        key, _, val = line.partition("=")
        key, val = key.strip(), val.strip()
        if len(val) >= 2 and val[0] == val[-1] and val[0] in "'\"":
            val = val[1:-1]
        loaded[key] = val
        if override or key not in os.environ:
            os.environ[key] = val
    return loaded


def _csv(value: Optional[str]) -> tuple[str, ...]:
    if not value:
        return ()
    return tuple(s.strip() for s in value.split(",") if s.strip())


@dataclass(frozen=True)
class AppConfig:
    """Reference AppConfig analogue (config.py:50-88)."""

    log_level: str = "INFO"
    reports_output_dir: Path = Path("./reports")

    @classmethod
    def from_env(cls, env: Mapping[str, str] | None = None) -> "AppConfig":
        env = env if env is not None else os.environ
        level = env.get("LOG_LEVEL", "INFO").upper()
        if level not in ("DEBUG", "INFO", "WARNING", "ERROR", "CRITICAL"):
            raise ValueError(f"invalid LOG_LEVEL: {level}")
        return cls(
            log_level=level,
            reports_output_dir=Path(env.get("REPORTS_OUTPUT_DIR", "./reports")),
        )


@dataclass(frozen=True)
class DatabaseConfig:
    """Reference DatabaseConfig analogue (config.py:13-48): connection
    parameters from ``DB_*`` environment variables, rendered as a Spark
    JDBC url + options instead of a SQLAlchemy connection string.

    The reference validates ``driver in ["mysql"]``; here any scheme with
    a JDBC driver on the classpath works (mysql, postgresql, derby, ...)
    — the scheme IS the dialect in Spark's JDBC source."""

    host: str = "localhost"
    port: int = 3306
    name: str = ""
    user: str = ""
    password: str = ""
    driver: str = "mysql"

    @classmethod
    def from_env(cls, env: Mapping[str, str] | None = None) -> "DatabaseConfig":
        env = env if env is not None else os.environ
        return cls(
            host=env.get("DB_HOST", "localhost"),
            port=int(env.get("DB_PORT", "3306")),
            name=env.get("DB_NAME", ""),
            user=env.get("DB_USER", ""),
            password=env.get("DB_PASSWORD", ""),
            driver=env.get("DB_DRIVER", "mysql"),
        )

    @property
    def jdbc_url(self) -> str:
        return f"jdbc:{self.driver}://{self.host}:{self.port}/{self.name}"

    @property
    def jdbc_options(self) -> dict[str, str]:
        opts: dict[str, str] = {}
        if self.user:
            opts["user"] = self.user
        if self.password:
            opts["password"] = self.password
        return opts


@dataclass(frozen=True)
class DuplicatesConfig:
    """The four duplicate-validation lists (.env.example:22-37)."""

    skip_patterns: tuple[str, ...] = DEFAULT_SKIP_PATTERNS
    force_patterns: tuple[str, ...] = DEFAULT_FORCE_PATTERNS
    force_columns: tuple[str, ...] = ()
    allow_columns: tuple[str, ...] = ()

    @classmethod
    def from_env(cls, env: Mapping[str, str] | None = None) -> "DuplicatesConfig":
        env = env if env is not None else os.environ
        return cls(
            skip_patterns=_csv(env.get("SKIP_DUPLICATE_PATTERNS"))
            or DEFAULT_SKIP_PATTERNS,
            force_patterns=_csv(env.get("FORCE_UNIQUE_PATTERNS"))
            or DEFAULT_FORCE_PATTERNS,
            force_columns=_csv(env.get("FORCE_UNIQUE_COLUMNS")),
            allow_columns=_csv(env.get("ALLOW_DUPLICATE_COLUMNS")),
        )

    def make_validator(self, **kwargs):
        from mysql_data_quality_spark.validators.duplicates import (
            DuplicatesValidator,
        )

        return DuplicatesValidator(
            skip_patterns=self.skip_patterns,
            force_patterns=self.force_patterns,
            force_columns=self.force_columns,
            allow_columns=self.allow_columns,
            **kwargs,
        )


_TRUTHY = ("1", "true", "yes", "on")


def rules_from_env(
    env: Mapping[str, str] | None = None, base: tuple | None = None
) -> tuple:
    """Quality-filter rule registry with env overrides applied.

    ``DQS_RULE_<NAME>=<value>`` overrides a rule's threshold (``lo:hi`` for
    range rules); ``DQS_RULE_<NAME>_ENABLED=false`` disables a rule.  Rule
    names are the registry names upper-cased (MIN_WORDS, SYMBOL_RATIO, ...).
    Unknown DQS_RULE_ keys raise — a typo'd override must not silently run
    the default pipeline.
    """
    from mysql_data_quality_spark.rules.heuristics import DEFAULT_RULES

    env = env if env is not None else os.environ
    rules = list(base if base is not None else DEFAULT_RULES)
    by_name = {r.name.upper(): i for i, r in enumerate(rules)}
    known = set(by_name) | {f"{n}_ENABLED" for n in by_name}
    for key, raw in env.items():
        if not key.startswith("DQS_RULE_"):
            continue
        suffix = key[len("DQS_RULE_") :]
        if suffix not in known:
            raise ValueError(
                f"unknown rule override {key}; rules: {sorted(by_name)}"
            )
        if suffix.endswith("_ENABLED"):
            name = suffix[: -len("_ENABLED")]
            rules[by_name[name]] = replace(
                rules[by_name[name]], enabled=raw.strip().lower() in _TRUTHY
            )
            continue
        r = rules[by_name[suffix]]
        if r.op == "range":
            lo, _, hi = raw.partition(":")
            value: object = (float(lo), float(hi))
        elif isinstance(r.value, bool):
            # bool before int (bool IS an int): the C4 page predicates
            # threshold on boolean features — float(raw) would crash on
            # "false" and 1.0 would fail Spark analysis (r4 review)
            value = raw.strip().lower() in _TRUTHY
        elif isinstance(r.value, str):
            value = raw
        elif isinstance(r.value, int):
            value = int(raw)
        else:
            value = float(raw)
        rules[by_name[suffix]] = replace(r, value=value)
    return tuple(rules)


@dataclass(frozen=True)
class Config:
    """Everything :func:`load_config` returns (reference config.py:91-106)."""

    app: AppConfig = field(default_factory=AppConfig)
    duplicates: DuplicatesConfig = field(default_factory=DuplicatesConfig)
    rules: tuple = ()
    database: DatabaseConfig = field(default_factory=DatabaseConfig)


def load_config(
    dotenv_path: str | Path = ".env", env: Mapping[str, str] | None = None
) -> Config:
    """Load ``.env`` (if present) then assemble the full config from env."""
    if env is None:
        load_dotenv(dotenv_path)
    return Config(
        app=AppConfig.from_env(env),
        duplicates=DuplicatesConfig.from_env(env),
        rules=rules_from_env(env),
        database=DatabaseConfig.from_env(env),
    )
