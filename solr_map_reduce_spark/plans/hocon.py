"""Morphline HOCON config compiler (closes SURVEY §2's last cosmetic gap).

The reference compiles HOCON morphline configs into command chains
(mr/morphline/MorphlineMapRunner.java:153; the flagship example is
morphlines-core/src/test/resources/test-morphlines/tutorialReadAvroContainer.conf).
This module makes those SAME config files executable on this engine:

- :func:`parse_hocon` — a self-contained parser for the HOCON subset the
  reference's configs actually use (written from the public HOCON spec,
  github.com/lightbend/config/blob/master/HOCON.md): objects/arrays,
  ``key : value`` and ``key { ... }``, ``#``/``//`` comments, optional
  commas, quoted/triple-quoted/unquoted strings, numbers, booleans, and
  ``${path}`` substitutions resolved against the root.
- :func:`compile_morphline` — maps the known morphline commands onto the
  engine's pipeline ops (plans/pipeline.py) and source formats
  (sources/readers.py), returning a :class:`CompiledMorphline` with the
  input format, the transformation :class:`~.pipeline.Pipeline`, and
  whether a terminal ``loadSolr`` was requested (the caller feeds that to
  ``IndexJob``).

Command mapping (reference builder → engine op):

| readAvroContainer / readCSV / readJson | input format for read_input  |
| extractAvroPaths                       | extract_paths (+flatten opt) |
| extractAvroTree                        | flatten                      |
| convertTimestamp                       | convert_timestamp            |
| sanitizeUnknownSolrFields              | sanitize (schema arg)        |
| generateSolrSequenceKey                | generate_key                 |
| setValues / generateUUID               | set_values / generate_uuid   |
| separateAttachments                    | explode                      |
| logDebug                               | observe                      |
| loadSolr                               | terminal marker              |

Unknown commands raise in strict mode (the reference fails on unknown
builders too) or are collected in ``skipped`` otherwise.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

from solr_map_reduce_spark.plans.pipeline import Pipeline, compile_pipeline
from solr_map_reduce_spark.schema import IndexSchema

# ---------------------------------------------------------------------------
# HOCON-subset parser
# ---------------------------------------------------------------------------


class _Subst:
    __slots__ = ("path",)

    def __init__(self, path: str):
        self.path = path


def _merge_values(old, new):
    """HOCON duplicate-key semantics: two object values merge
    recursively (later wins per leaf); any other combination is
    last-value-wins."""
    if isinstance(old, dict) and isinstance(new, dict):
        out = dict(old)
        for k, v in new.items():
            out[k] = _merge_values(out[k], v) if k in out else v
        return out
    return new


class _Parser:
    def __init__(self, text: str):
        self.s = text
        self.i = 0

    # -- low-level ----------------------------------------------------------
    def _peek(self) -> str:
        return self.s[self.i] if self.i < len(self.s) else ""

    def _at_comment(self) -> bool:
        return self.s.startswith("#", self.i) or self.s.startswith("//", self.i)

    def _skip(self, *, separators: bool) -> None:
        """Skip whitespace and comments; with ``separators`` also newlines
        and commas (element boundaries inside containers)."""
        while self.i < len(self.s):
            c = self.s[self.i]
            if self._at_comment():
                while self.i < len(self.s) and self.s[self.i] != "\n":
                    self.i += 1
            elif c in " \t\r" or (separators and c in "\n,"):
                self.i += 1
            else:
                return

    # -- values -------------------------------------------------------------
    def parse_root(self) -> dict:
        self._skip(separators=True)
        if self._peek() == "{":
            return self.parse_object()
        # HOCON allows omitting the root braces
        return self._object_body(end=None)

    def parse_object(self) -> dict:
        assert self._peek() == "{"
        self.i += 1
        out = self._object_body(end="}")
        self.i += 1  # consume '}'
        return out

    def _object_body(self, end: str | None) -> dict:
        out: dict = {}
        while True:
            self._skip(separators=True)
            if self.i >= len(self.s):
                if end is None:
                    return out
                raise ValueError("unterminated object")
            if end is not None and self._peek() == end:
                return out
            key = self._parse_key()
            self._skip(separators=False)
            c = self._peek()
            if c == "{":  # "key { ... }" implies object merge syntax
                val = self.parse_object()
            elif c in ":=":
                self.i += 1
                self._skip(separators=False)
                val = self.parse_value()
            else:
                raise ValueError(f"expected ':' after key {key!r} at {self.i}")
            # HOCON duplicate-key rule (spec §"Duplicate keys and object
            # merging"): object values MERGE field-by-field (later wins
            # per leaf), anything else replaces.  Plain replacement
            # silently dropped every earlier field of a re-opened block.
            out[key] = _merge_values(out[key], val) if key in out else val

    def _parse_key(self) -> str:
        if self._peek() == '"':
            return self._parse_quoted()
        start = self.i
        while self.i < len(self.s) and self.s[self.i] not in ":={ \t\r\n":
            self.i += 1
        return self.s[start : self.i]

    def parse_array(self) -> list:
        assert self._peek() == "["
        self.i += 1
        out = []
        while True:
            self._skip(separators=True)
            if self.i >= len(self.s):
                raise ValueError("unterminated array")
            if self._peek() == "]":
                self.i += 1
                return out
            out.append(self.parse_value())

    def _parse_quoted(self) -> str:
        if self.s.startswith('"""', self.i):
            end = self.s.index('"""', self.i + 3)
            out = self.s[self.i + 3 : end]
            self.i = end + 3
            return out
        assert self._peek() == '"'
        self.i += 1
        out = []
        while self.i < len(self.s):
            c = self.s[self.i]
            if c == "\\":
                nxt = self.s[self.i + 1]
                out.append({"n": "\n", "t": "\t", '"': '"', "\\": "\\"}.get(nxt, nxt))
                self.i += 2
            elif c == '"':
                self.i += 1
                return "".join(out)
            else:
                out.append(c)
                self.i += 1
        raise ValueError("unterminated string")

    def parse_value(self):
        c = self._peek()
        if c == "{":
            return self.parse_object()
        if c == "[":
            return self.parse_array()
        if c == '"':
            return self._parse_quoted()
        if c == "$" and self.s.startswith("${", self.i):
            end = self.s.index("}", self.i)
            path = self.s[self.i + 2 : end]
            self.i = end + 1
            return _Subst(path)
        # unquoted scalar: up to a structural char / separator / comment.
        # Subset limit (fine for the reference's newline-separated
        # configs): an unquoted scalar runs to end-of-line, so a SIBLING
        # key on the same line ("port : 1 zk { ... }") would be swallowed
        # into the value — put each key on its own line.
        start = self.i
        while self.i < len(self.s):
            ch = self.s[self.i]
            if ch in ",\n}]" or self._at_comment():
                break
            self.i += 1
        raw = self.s[start : self.i].strip()
        return _coerce_scalar(raw)


def _coerce_scalar(raw: str):
    low = raw.lower()
    if low == "true":
        return True
    if low == "false":
        return False
    if low in ("null", "none"):
        return None
    try:
        return int(raw)
    except ValueError:
        pass
    try:
        return float(raw)
    except ValueError:
        pass
    return raw


def _resolve(node, root):
    if isinstance(node, _Subst):
        cur = root
        for part in node.path.split("."):
            cur = cur[part]
        return _resolve(cur, root)
    if isinstance(node, dict):
        return {k: _resolve(v, root) for k, v in node.items()}
    if isinstance(node, list):
        return [_resolve(v, root) for v in node]
    return node


def parse_hocon(text: str) -> dict:
    """Parse a HOCON document (reference-config subset) to plain dicts,
    with ``${path}`` substitutions resolved against the root."""
    root = _Parser(text).parse_root()
    return _resolve(root, root)


# ---------------------------------------------------------------------------
# morphline command mapping
# ---------------------------------------------------------------------------

_READ_FORMATS = {
    "readAvroContainer": "avro",
    "readCSV": "csv",
    "readJson": "json",
    "readLine": "text",
}


@dataclass
class CompiledMorphline:
    """A reference morphline config, compiled against this engine."""

    morphline_id: str
    input_format: str | None
    pipeline: Pipeline
    load_solr: bool
    read_options: dict = dc_field(default_factory=dict)
    skipped: list = dc_field(default_factory=list)


def compile_morphline(
    config: dict | str,
    schema: IndexSchema | None = None,
    morphline_id: str | None = None,
    strict: bool = True,
) -> CompiledMorphline:
    """Compile one morphline from a parsed (or raw HOCON string) config.

    ``schema`` stands in for the reference's ZooKeeper-fetched Solr schema
    (``solrLocator``) for sanitizeUnknownSolrFields / generateSolrSequenceKey.
    """
    if isinstance(config, str):
        config = parse_hocon(config)
    morphlines = config.get("morphlines", [])
    if not morphlines:
        raise ValueError("config has no 'morphlines' entry")
    chosen = None
    for m in morphlines:
        if morphline_id is None or m.get("id") == morphline_id:
            chosen = m
            break
    if chosen is None:
        raise ValueError(f"morphline {morphline_id!r} not found")

    input_format: str | None = None
    read_options: dict = {}
    spec: list[dict] = []
    load_solr = False
    skipped: list[str] = []

    for cmd in chosen.get("commands", []):
        (name, args), = cmd.items()
        args = args or {}
        if name in _READ_FORMATS:
            input_format = _READ_FORMATS[name]
            if name == "readCSV":
                read_options = {
                    k: v
                    for k, v in (
                        ("sep", args.get("separator")),
                        ("charset", args.get("charset")),
                    )
                    if v is not None
                }
                # the reference's CSV morphlines
                # (solrCellDocumentTypes.conf:105-110) rely on these two:
                # ignoreFirstLine → skip the header row; columns → positional
                # names (previously silently dropped: Spark kept header rows
                # and default _c0/_c1 names, mismatching every downstream
                # field-addressed command).  With neither present the
                # reader's header=true default stands (legacy behavior:
                # names from the file's first line).
                cols = args.get("columns")
                if args.get("ignoreFirstLine"):
                    read_options["header"] = "true"  # consume the first line
                elif cols:
                    read_options["header"] = "false"  # every line is data
                if cols:
                    spec.append({"op": "rename_positional", "names": list(cols)})
        elif name == "extractAvroPaths":
            if args.get("flatten"):
                spec.append({"op": "flatten"})
            spec.append({"op": "extract_paths", "paths": dict(args.get("paths", {}))})
        elif name == "extractAvroTree":
            spec.append({"op": "flatten"})
        elif name == "convertTimestamp":
            entry: dict = {"op": "convert_timestamp", "field": args["field"]}
            if "inputFormats" in args:
                entry["input_formats"] = tuple(args["inputFormats"])
            if "inputTimezone" in args:
                entry["input_timezone"] = args["inputTimezone"]
            if "outputFormat" in args:
                entry["output_format"] = args["outputFormat"]
            if "outputTimezone" in args:
                entry["output_timezone"] = args["outputTimezone"]
            spec.append(entry)
        elif name == "sanitizeUnknownSolrFields":
            if schema is None:
                raise ValueError(
                    "sanitizeUnknownSolrFields needs schema= (the engine "
                    "analog of the solrLocator-fetched Solr schema)"
                )
            spec.append({"op": "sanitize", "schema": schema})
        elif name == "generateSolrSequenceKey":
            if schema is None:
                raise ValueError("generateSolrSequenceKey needs schema=")
            spec.append(
                {
                    "op": "generate_key",
                    "base_id_col": args.get("baseIdField", "base_id"),
                    "key": schema.unique_key,
                }
            )
        elif name == "setValues":
            spec.append({"op": "set_values", "values": dict(args)})
        elif name == "generateUUID":
            spec.append({"op": "generate_uuid", "field": args.get("field", "id")})
        elif name == "extractJsonPaths":
            spec.append({
                "op": "extract_json",
                "field": str(args.get("field", "props")),
                "paths": {k: str(v) for k, v in dict(args.get("paths", {})).items()},
                "drop": bool(args.get("drop", True)),
            })
        elif name == "separateAttachments":
            spec.append({"op": "explode", "field": args.get("field", "_attachment_body")})
        elif name == "logDebug":
            spec.append({"op": "observe", "name": f"logDebug_{len(spec)}"})
        elif name == "loadSolr":
            load_solr = True
        elif strict:
            raise ValueError(f"unsupported morphline command: {name!r}")
        else:
            skipped.append(name)

    return CompiledMorphline(
        morphline_id=str(chosen.get("id", "")),
        input_format=input_format,
        pipeline=compile_pipeline(spec),
        load_solr=load_solr,
        read_options=read_options,
        skipped=skipped,
    )
