"""YAML pipeline config — the rebuild of hetman's config layer.

Mirrors Config/TargetConfig loading + validation
(/root/reference/internal/config/config.go:43-139) adapted to the
batch pipeline: a target = {id, input.path, parser, modifier,
forwarders[]}; Process() expands targets into PipelineSpecs the way
the reference expands them into Workflows (config.go:141-258),
deduplicating identical input paths (config.go:219-242).

Validation semantics kept from the reference:
- duplicate non-empty target IDs are an error (config.go:103-116,
  golden: config_test.go TestDetectDuplicateTargetID)
- unknown parser format is an error (parser.NewParser returns nil on
  bad format, parser_test.go:69-87)
- a target with no input becomes a "headless" spec (aggregator mode,
  config.go:206-214) — kept as a spec with input_path="" so a
  pre-labeled source can be attached.
"""

from __future__ import annotations

from dataclasses import dataclass

from hetman_spark.config import (
    ModifierConfig,
    ParserConfig,
    PipelineSpec,
    ReplaceFieldSetting,
    SinkConfig,
)

_VALID_FORMATS = {"", "nginx", "json", "syslog-rfc5424", "syslog-rfc3164"}


class ConfigError(ValueError):
    pass


@dataclass(frozen=True)
class GlobalConfig:
    out_dir: str = ""
    n_splits: int = 16
    salt_buckets: int = 8
    splits_per_commit: int = 64


def _parse_sink(d: dict) -> SinkConfig:
    pred = d.get("predicate", {}) or {}
    return SinkConfig(
        url=d["url"],
        add_tags=dict(d.get("add_tags", {}) or {}),
        predicate_col=pred.get("col", "*"),
        predicate_val=pred.get("val", "*"),
        format=d.get("format", "parquet"),
    )


def _parse_target(d: dict) -> PipelineSpec:
    parser_d = d.get("parser", {}) or {}
    fmt = parser_d.get("format", "")
    if fmt not in _VALID_FORMATS:
        raise ConfigError(f"unknown parser format: {fmt!r}")
    mod_d = d.get("modifier", {}) or {}
    modifier = ModifierConfig(
        add_fields=dict(mod_d.get("add_fields", {}) or {}),
        drop_fields=tuple(mod_d.get("drop_fields", []) or []),
        replace_fields=tuple(
            ReplaceFieldSetting(r["path"], r["pattern"], r["replacement"])
            for r in (mod_d.get("replace_fields", []) or [])
        ),
    )
    sinks = tuple(_parse_sink(f) for f in (d.get("forwarders", []) or []))
    if not sinks:
        raise ConfigError(f"target {d.get('id', '?')!r} has no forwarders")
    return PipelineSpec(
        id=d.get("id", ""),
        input_path=(d.get("input", {}) or {}).get("path", ""),
        parser=ParserConfig(
            format=fmt,
            pattern=parser_d.get("pattern", ""),
            multiline_pattern=(parser_d.get("multiline", {}) or {}).get("pattern", ""),
        ),
        modifier=modifier,
        sinks=sinks,
    )


def detect_duplicate_target_ids(targets: list[dict]) -> None:
    """config.go:103-116: non-empty target IDs must be unique."""
    seen: set[str] = set()
    for t in targets:
        tid = t.get("id", "")
        if tid:
            if tid in seen:
                raise ConfigError(f"duplicate target ID: {tid}")
            seen.add(tid)


def load_config(path: str) -> tuple[GlobalConfig, list[PipelineSpec]]:
    """YAML file -> (global config, pipeline specs).

    Identical input paths are merged into one spec with the union of
    their sinks (the reference's unique-path workflow dedup,
    config.go:219-242 — one tailer per file, forwarders merged).
    """
    import yaml

    with open(path) as f:
        raw = yaml.safe_load(f) or {}

    g = raw.get("global", {}) or {}
    gc = GlobalConfig(
        out_dir=g.get("out_dir", ""),
        n_splits=int(g.get("n_splits", 16)),
        salt_buckets=int(g.get("salt_buckets", 8)),
        splits_per_commit=int(g.get("splits_per_commit", 64)),
    )

    targets = raw.get("targets", []) or []
    detect_duplicate_target_ids(targets)
    specs = [_parse_target(t) for t in targets]

    # unique-path dedup: merge sink lists for targets tailing the same path
    by_path: dict[str, PipelineSpec] = {}
    merged: list[PipelineSpec] = []
    for spec in specs:
        if spec.input_path and spec.input_path in by_path:
            prev = by_path[spec.input_path]
            combined = prev.sinks + tuple(s for s in spec.sinks if s not in prev.sinks)
            replacement = PipelineSpec(
                id=prev.id, input_path=prev.input_path, parser=prev.parser,
                modifier=prev.modifier, sinks=combined,
                n_splits=prev.n_splits, salt_buckets=prev.salt_buckets,
            )
            by_path[spec.input_path] = replacement
            merged[merged.index(prev)] = replacement
        else:
            if spec.input_path:
                by_path[spec.input_path] = spec
            merged.append(spec)
    return gc, merged
