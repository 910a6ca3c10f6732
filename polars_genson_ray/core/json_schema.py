"""Genson-style commutative JSON-schema merge core.

A :class:`SchemaNode` accumulates JSON values (``add_object``) and/or JSON
schemas (``add_schema``) and emits the merged JSON Schema (``to_schema``).
The merge is commutative and associative up to the canonicalisation applied
by ``reorder_unions`` — the property the Ray engine exploits to reduce
per-block partial schemas with a dataset-level aggregate.

Semantics replicate the reference engine's strategy lattice:
  - node routing/emission: genson-core/src/genson_rs/node.rs:43-182
  - object strategy (first-seen field order via insertion-ordered dicts,
    required = intersection): genson-core/src/genson_rs/strategy/object.rs
  - list/tuple strategies: genson-core/src/genson_rs/strategy/array.rs
  - scalar strategies incl. integer->number widening:
    genson-core/src/genson_rs/strategy/scalar.rs:125-181
  - extra-keyword first-wins merge: genson-core/src/genson_rs/strategy/base.rs:27-40
  - builder $schema handling: genson-core/src/genson_rs/builder.rs:8-102

This is a fresh Python implementation (plain dicts as the schema IR), not a
transliteration of the Rust.
"""

from __future__ import annotations

import copy
import re

__all__ = ["SchemaNode", "SchemaBuilder", "wire_mode"]

_DEFAULT_SCHEMA_URI = "http://json-schema.org/schema#"
_NULL_SCHEMA_URI = "NULL"

# --- partial-schema wire mode -------------------------------------------
#
# The reference's emission rule drops an EMPTY required set (object.rs
# emission + the include_empty_required quirk), which makes a round-trip
# through JSON lossy: "required became empty by intersection" and "no
# required constraint seen" serialize identically. Sequentially that is
# harmless (state never round-trips), but the distributed reduce emits a
# partial schema per batch and re-merges it — without the distinction the
# merge is NOT a monoid and the result depends on batch boundaries
# (observed: a 4-partial merge resurrecting `required` that the sequential
# path had intersected away).
#
# Wire mode — entered ONLY around the internal partial serialize/merge in
# stages/infer.py — fixes both ends: emission keeps `"required": []` when
# the set is empty-after-intersection, and add_schema treats an empty list
# as a true empty intersection instead of setting include_empty_required.
# User-facing emission and user-supplied schemas (CLI, api) never run in
# wire mode, so reference byte-parity is untouched.

_WIRE = False


class wire_mode:
    """Context manager enabling the lossless partial-schema wire format."""

    def __enter__(self):
        global _WIRE
        self._prev = _WIRE
        _WIRE = True
        return self

    def __exit__(self, *exc):
        global _WIRE
        _WIRE = self._prev
        return False


def _deepcopy(v):
    # schemas are plain JSON values — a direct recursive copy skips
    # copy.deepcopy's memo/dispatch machinery (~3× faster here)
    if isinstance(v, dict):
        return {k: _deepcopy(x) for k, x in v.items()}
    if isinstance(v, list):
        return [_deepcopy(x) for x in v]
    return v


class _Strategy:
    """Base strategy: collects non-``type`` keywords first-wins."""

    __slots__ = ("extra_keywords",)

    def __init__(self):
        self.extra_keywords = {}

    def add_extra_keywords(self, schema: dict) -> None:
        # Borrow, don't deepcopy: input schemas are transient per-document /
        # per-partial dicts that callers never mutate after add_schema (the
        # ownership contract of the merge). ``to_schema`` deep-copies on
        # emission, so outputs never alias builder state. (Deep-copying
        # here was 65% of inference runtime on map-heavy documents — the
        # "properties" subtree of every merged schema was copied despite
        # being overwritten at emission.)
        # "$schema" is metadata, never a keyword (documented divergence
        # from base.rs:27-40, which lets a second added schema's header
        # survive as an extra keyword and leak into anyOf branches for
        # root-mixed-type corpora — making the merge depend on which doc
        # lands first in which builder, i.e. on chunk boundaries; the
        # reference's own sequential and parallel paths disagree on such
        # inputs, and all 217 replayed snapshots pass with the skip)
        for k, v in schema.items():
            if k != "type" and k != "$schema" and k not in self.extra_keywords:
                self.extra_keywords[k] = v

    def add_schema(self, schema: dict) -> None:
        self.add_extra_keywords(schema)

    def add_object(self, obj) -> None:
        pass

    def to_schema(self) -> dict:
        return _deepcopy(self.extra_keywords)

    # match_schema / match_object are provided as static-like methods on
    # subclasses via the registry below.


class _NullStrategy(_Strategy):
    JS_TYPE = "null"

    @staticmethod
    def match_schema(schema):
        return schema.get("type") == "null"

    @staticmethod
    def match_object(obj):
        return obj is None

    def to_schema(self):
        s = _deepcopy(self.extra_keywords)
        s["type"] = self.JS_TYPE
        return s


class _BooleanStrategy(_NullStrategy):
    JS_TYPE = "boolean"

    @staticmethod
    def match_schema(schema):
        return schema.get("type") == "boolean"

    @staticmethod
    def match_object(obj):
        return isinstance(obj, bool)


class _StringStrategy(_NullStrategy):
    JS_TYPE = "string"

    @staticmethod
    def match_schema(schema):
        return schema.get("type") == "string"

    @staticmethod
    def match_object(obj):
        return isinstance(obj, str)


class _NumberStrategy(_Strategy):
    """integer until a float value or a ``number`` schema is seen."""

    __slots__ = ("number_type",)

    def __init__(self):
        super().__init__()
        self.number_type = "integer"

    @staticmethod
    def match_schema(schema):
        return schema.get("type") in ("number", "integer")

    @staticmethod
    def match_object(obj):
        return isinstance(obj, (int, float)) and not isinstance(obj, bool)

    def add_schema(self, schema):
        self.add_extra_keywords(schema)
        if schema.get("type") == "number":
            self.number_type = "number"

    def add_object(self, obj):
        if isinstance(obj, float):
            self.number_type = "number"

    def to_schema(self):
        s = _deepcopy(self.extra_keywords)
        s["type"] = self.number_type
        return s


class _TypelessStrategy(_Strategy):
    """Placeholder for ``{}`` schemas; folded into the first typed strategy."""

    @staticmethod
    def match_schema(schema):
        if isinstance(schema, dict):
            return "type" not in schema
        return True

    @staticmethod
    def match_object(obj):
        return False


class _ObjectStrategy(_Strategy):
    __slots__ = ("properties", "pattern_properties", "required", "include_empty_required")

    def __init__(self):
        super().__init__()
        self.properties: dict[str, SchemaNode] = {}
        self.pattern_properties: dict[str, SchemaNode] = {}
        self.required: set[str] | None = None
        self.include_empty_required = False

    @staticmethod
    def match_schema(schema):
        return schema.get("type") == "object"

    @staticmethod
    def match_object(obj):
        return isinstance(obj, dict)

    def add_object(self, obj: dict):
        props_seen = set()
        for prop, subobj in obj.items():
            matched_pattern = False
            if prop not in self.properties:
                for pattern, node in self.pattern_properties.items():
                    if re.search(pattern, prop):
                        node.add_object(subobj)
                        matched_pattern = True
                        break
            if not matched_pattern:
                props_seen.add(prop)
                node = self.properties.get(prop)
                if node is None:
                    node = self.properties[prop] = SchemaNode()
                node.add_object(subobj)
        if self.required is None:
            self.required = props_seen
        else:
            self.required &= props_seen

    def add_schema(self, schema: dict):
        self.add_extra_keywords(schema)
        props = schema.get("properties")
        if isinstance(props, dict):
            for prop, sub_schema in props.items():
                node = self.properties.get(prop)
                if node is None:
                    node = self.properties[prop] = SchemaNode()
                node.add_schema(sub_schema)
        pprops = schema.get("patternProperties")
        if isinstance(pprops, dict):
            for pattern, sub_schema in pprops.items():
                node = self.pattern_properties.get(pattern)
                if node is None:
                    node = self.pattern_properties[pattern] = SchemaNode()
                node.add_schema(sub_schema)
        if "required" in schema and isinstance(schema["required"], list):
            req = schema["required"]
            if not req and not _WIRE:
                self.include_empty_required = True
            req_set = {r for r in req if isinstance(r, str)}
            if self.required is None:
                self.required = req_set
            else:
                self.required &= req_set

    def add_schemas_batch(self, schemas: list):
        """C4 batch merge (genson-core node.rs:61-108): properties grouped
        across the whole batch, ONE recursive call per property node with
        that property's subschema list — instead of one full traversal per
        schema. First-seen property order, first-wins extras and the
        required intersection all follow batch order, so the result is
        identical to sequential ``add_schema`` calls."""
        prop_groups: dict[str, list] = {}
        pattern_groups: dict[str, list] = {}
        for schema in schemas:
            self.add_extra_keywords(schema)
            props = schema.get("properties")
            if isinstance(props, dict):
                for prop, sub in props.items():
                    g = prop_groups.get(prop)
                    if g is None:
                        g = prop_groups[prop] = []
                    g.append(sub)
            pprops = schema.get("patternProperties")
            if isinstance(pprops, dict):
                for pattern, sub in pprops.items():
                    g = pattern_groups.get(pattern)
                    if g is None:
                        g = pattern_groups[pattern] = []
                    g.append(sub)
            if "required" in schema and isinstance(schema["required"], list):
                req = schema["required"]
                if not req and not _WIRE:
                    self.include_empty_required = True
                req_set = {r for r in req if isinstance(r, str)}
                if self.required is None:
                    self.required = req_set
                else:
                    self.required &= req_set
        for prop, subs in prop_groups.items():
            node = self.properties.get(prop)
            if node is None:
                node = self.properties[prop] = SchemaNode()
            node.add_schemas(subs)
        for pattern, subs in pattern_groups.items():
            node = self.pattern_properties.get(pattern)
            if node is None:
                node = self.pattern_properties[pattern] = SchemaNode()
            node.add_schemas(subs)

    def to_schema(self):
        # skip deep-copying extras that are overwritten just below — the
        # borrowed "properties" subtree of a merged schema can be the bulk
        # of the document
        skip = set()
        if self.properties:
            skip.add("properties")
        if self.pattern_properties:
            skip.add("patternProperties")
        # placeholders keep each key's first-seen position (overwritten below)
        s = {
            k: (None if k in skip else _deepcopy(v))
            for k, v in self.extra_keywords.items()
        }
        s["type"] = "object"
        if self.properties:
            s["properties"] = {p: n.to_schema() for p, n in self.properties.items()}
        if self.pattern_properties:
            s["patternProperties"] = {
                p: n.to_schema() for p, n in self.pattern_properties.items()
            }
        if _WIRE and self.required is not None:
            # lossless wire emission: empty-after-intersection stays []
            s["required"] = sorted(self.required)
        elif self.required is not None or self.include_empty_required:
            req = sorted(self.required) if self.required else []
            if req or self.include_empty_required:
                s["required"] = req
            else:
                s.pop("required", None)
        else:
            s.pop("required", None)
        return s


class _ListStrategy(_Strategy):
    """Single unified ``items`` schema for all elements."""

    __slots__ = ("items",)

    def __init__(self):
        super().__init__()
        self.items = SchemaNode()

    @staticmethod
    def match_schema(schema):
        return schema.get("type") == "array" and isinstance(schema.get("items"), dict)

    @staticmethod
    def match_object(obj):
        return isinstance(obj, list)

    def add_object(self, obj: list):
        for el in obj:
            self.items.add_object(el)

    def add_schema(self, schema: dict):
        # NB: the reference ListStrategy does NOT merge extra keywords
        # (genson-core/src/genson_rs/strategy/array.rs:103-112).
        if "items" in schema:
            self.items.add_schema(schema["items"])

    def to_schema(self):
        s = _deepcopy(self.extra_keywords)
        s["type"] = "array"
        s["items"] = self.items.to_schema()
        return s


class _TupleStrategy(_Strategy):
    """Positional ``items`` array of schemas (only built from tuple schemas)."""

    __slots__ = ("items",)

    def __init__(self):
        super().__init__()
        self.items = [SchemaNode()]

    @staticmethod
    def match_schema(schema):
        return schema.get("type") == "array" and isinstance(schema.get("items"), list)

    @staticmethod
    def match_object(obj):
        return isinstance(obj, list)

    def _grow(self, n):
        while len(self.items) < n:
            self.items.append(SchemaNode())

    def add_object(self, obj: list):
        self._grow(len(obj))
        for node, el in zip(self.items, obj):
            node.add_object(el)

    def add_schema(self, schema: dict):
        self.add_extra_keywords(schema)
        items = schema.get("items")
        if isinstance(items, list):
            self._grow(len(items))
            for node, sub in zip(self.items, items):
                node.add_schema(sub)

    def to_schema(self):
        s = _deepcopy(self.extra_keywords)
        s["type"] = "array"
        if self.items:
            s["items"] = [n.to_schema() for n in self.items]
        return s


# Match order mirrors genson_rs/strategy/mod.rs:30-68 (Object, List, Tuple,
# Null, Boolean, Number, String). For raw objects only List matches arrays.
_OBJECT_ORDER = (
    _ObjectStrategy,
    _ListStrategy,
    _NullStrategy,
    _BooleanStrategy,
    _NumberStrategy,
    _StringStrategy,
)
_SCHEMA_ORDER = (
    _ObjectStrategy,
    _ListStrategy,
    _TupleStrategy,
    _NullStrategy,
    _BooleanStrategy,
    _NumberStrategy,
    _StringStrategy,
)

# prebound (cls, match_fn) pairs — getattr-per-call in the dispatch loop was
# measurable on map-heavy documents
_SCHEMA_MATCHERS = tuple((cls, cls.match_schema) for cls in _SCHEMA_ORDER)
_OBJECT_MATCHERS = tuple((cls, cls.match_object) for cls in _OBJECT_ORDER)

# type-string → strategy class for the keyed dispatch fast path. The keys
# partition exactly the space the match_schema scan covers (List vs Tuple
# disambiguated by the items type; Number owns both "integer" and "number"),
# so a keyed hit always equals the linear scan's answer.
_KEY2CLS = {
    "null": _NullStrategy,
    "boolean": _BooleanStrategy,
    "string": _StringStrategy,
    "integer": _NumberStrategy,
    "number": _NumberStrategy,
    "object": _ObjectStrategy,
    "array:l": _ListStrategy,
    "array:t": _TupleStrategy,
}
# type values for which a bare {"type": X} schema cannot change strategy
# state (beyond Number widening, special-cased at the call sites)
_TYPE_ONLY_NOOP = frozenset(
    {"null", "boolean", "string", "integer", "number", "object"}
)
_CLS2KEYS = {
    _NullStrategy: ("null",),
    _BooleanStrategy: ("boolean",),
    _StringStrategy: ("string",),
    _NumberStrategy: ("integer", "number"),
    _ObjectStrategy: ("object",),
    _ListStrategy: ("array:l",),
    _TupleStrategy: ("array:t",),
}


class SchemaNode:
    """Mergeable schema accumulator (one active strategy per JSON type seen)."""

    __slots__ = ("active_strategies", "_by_key")

    def __init__(self):
        self.active_strategies: list[_Strategy] = []
        # type-key → strategy for O(1) schema dispatch; every creation path
        # registers here, so a keyed hit equals the match_schema scan
        self._by_key: dict[str, _Strategy] = {}

    # -- schema decomposition ------------------------------------------------

    @staticmethod
    def _get_subschemas(schema):
        if isinstance(schema, dict):
            anyof = schema.get("anyOf")
            if isinstance(anyof, list):
                out = []
                for sub in anyof:
                    out.extend(SchemaNode._get_subschemas(sub))
                return out
            types = schema.get("type")
            if isinstance(types, list):
                out = []
                for t in types:
                    new_schema = dict(schema)
                    new_schema["type"] = t
                    out.append(new_schema)
                return out
            return [schema]
        return [schema]

    # -- merge entry points --------------------------------------------------

    def add_schema(self, schema) -> "SchemaNode":
        if isinstance(schema, SchemaNode):
            schema = schema.to_schema()
        if isinstance(schema, dict) and "anyOf" not in schema:
            t = schema.get("type")
            if type(t) is str:
                # keyed dispatch fast path (the overwhelmingly common case
                # in property-wise merges) — one dict probe instead of a
                # match_schema scan per active strategy
                if t == "array":
                    items = schema.get("items")
                    if type(items) is dict:
                        t = "array:l"
                    elif type(items) is list:
                        t = "array:t"
                    else:
                        raise ValueError(
                            f"Could not find matching schema type for schema: {schema!r}"
                        )
                strat = self._by_key.get(t)
                if strat is None:
                    strat = self._create_keyed(t)
                if len(schema) == 1 and t in _TYPE_ONLY_NOOP:
                    # bare {"type": X}: no extras to collect, no required/
                    # properties to merge — the only state change is the
                    # integer→number widening
                    if t == "number":
                        strat.number_type = "number"
                    return self
                strat.add_schema(schema)
                return self
            if not isinstance(t, list):
                # typeless / malformed-type: legacy scan keeps the quirks
                # (typeless folds into the first strategy; errors match)
                strategy = self._get_or_create(schema, for_schema=True)
                if strategy is not None:
                    strategy.add_schema(schema)
                return self
        for subschema in self._get_subschemas(schema):
            strategy = self._get_or_create(subschema, for_schema=True)
            if strategy is not None:
                strategy.add_schema(subschema)
        return self

    def add_schemas(self, schemas: list) -> "SchemaNode":
        """Batch merge (C4, genson-core node.rs:61-108): route each schema
        to its strategy with the keyed dispatch, group consecutive work per
        strategy, and hand ObjectStrategy groups to its property-grouped
        batch merge. Identical result to sequential ``add_schema`` — any
        schema needing the legacy path (typeless, anyOf, type lists)
        flushes pending groups first so first-wins extras keep batch order.
        """
        if len(schemas) > 1:
            # identity dedup, first occurrence kept: the merge is a
            # join-semilattice (a ⊔ a = a, first-wins/first-seen orders
            # follow the first occurrence), so later duplicates are no-ops.
            # The fast-path interning (infer._RECORD_CACHE) makes repeated
            # subschemas the SAME object — a wide map column whose values
            # share one record shape collapses to ONE merge per property.
            seen_ids = set()
            uniq = []
            for s in schemas:
                i = id(s)
                if i not in seen_ids:
                    seen_ids.add(i)
                    uniq.append(s)
            schemas = uniq

        groups: dict[int, tuple] = {}  # id(strategy) → (strategy, [schemas])

        def flush():
            for strat, group in groups.values():
                if type(strat) is _ObjectStrategy:
                    strat.add_schemas_batch(group)
                elif type(strat) is _NumberStrategy:
                    for s in group:
                        if len(s) == 1:
                            if s["type"] == "number":
                                strat.number_type = "number"
                        else:
                            strat.add_schema(s)
                else:
                    for s in group:
                        if len(s) > 1:  # bare {"type": X} is a no-op
                            strat.add_schema(s)
            groups.clear()

        for schema in schemas:
            if isinstance(schema, SchemaNode):
                schema = schema.to_schema()
            if isinstance(schema, dict) and "anyOf" not in schema:
                t = schema.get("type")
                if type(t) is str:
                    if t == "array":
                        items = schema.get("items")
                        if type(items) is dict:
                            t = "array:l"
                        elif type(items) is list:
                            t = "array:t"
                        else:
                            flush()
                            raise ValueError(
                                "Could not find matching schema type for "
                                f"schema: {schema!r}"
                            )
                    strat = self._by_key.get(t)
                    if strat is None:
                        strat = self._create_keyed(t)
                    entry = groups.get(id(strat))
                    if entry is None:
                        groups[id(strat)] = (strat, [schema])
                    else:
                        entry[1].append(schema)
                    continue
            flush()
            self.add_schema(schema)
        flush()
        return self

    def _create_keyed(self, key: str) -> "_Strategy":
        strategy = _KEY2CLS[key]()
        acts = self.active_strategies
        # Incorporate a trailing typeless strategy into the new typed
        # strategy (genson_rs/node.rs:223-230).
        if acts and isinstance(acts[-1], _TypelessStrategy):
            strategy.add_schema(acts[-1].to_schema())
            acts.pop()
        acts.append(strategy)
        for k in _CLS2KEYS[type(strategy)]:
            self._by_key[k] = strategy
        return strategy

    def add_object(self, obj) -> "SchemaNode":
        strategy = self._get_or_create(obj, for_schema=False)
        if strategy is None:
            raise ValueError(f"Could not find matching schema type for object: {obj!r}")
        strategy.add_object(obj)
        return self

    # -- strategy lookup -----------------------------------------------------

    def _get_or_create(self, schema_or_obj, for_schema: bool):
        if for_schema:
            for strat in self.active_strategies:
                if strat.match_schema(schema_or_obj):
                    return strat
        else:
            for strat in self.active_strategies:
                if strat.match_object(schema_or_obj):
                    return strat

        matchers = _SCHEMA_MATCHERS if for_schema else _OBJECT_MATCHERS
        for cls, match_fn in matchers:
            if match_fn(schema_or_obj):
                strategy = cls()
                # Incorporate a trailing typeless strategy into the new typed
                # strategy (genson_rs/node.rs:223-230).
                if self.active_strategies and isinstance(
                    self.active_strategies[-1], _TypelessStrategy
                ):
                    strategy.add_schema(self.active_strategies[-1].to_schema())
                    self.active_strategies.pop()
                self.active_strategies.append(strategy)
                for k in _CLS2KEYS[type(strategy)]:
                    self._by_key[k] = strategy
                return strategy

        if for_schema and _TypelessStrategy.match_schema(schema_or_obj):
            if not self.active_strategies:
                self.active_strategies.append(_TypelessStrategy())
            return self.active_strategies[0]
        if for_schema:
            raise ValueError(
                f"Could not find matching schema type for schema: {schema_or_obj!r}"
            )
        return None

    # -- emission ------------------------------------------------------------

    def to_schema(self) -> dict:
        scalar_types: set[str] = set()
        generated: list[dict] = []
        for strat in self.active_strategies:
            schema = strat.to_schema()
            if len(schema) == 1 and "type" in schema and isinstance(schema["type"], str):
                scalar_types.add(schema["type"])
            else:
                generated.append(schema)
        if scalar_types:
            if len(scalar_types) == 1:
                generated.append({"type": next(iter(scalar_types))})
            else:
                generated.append({"type": sorted(scalar_types)})
        if len(generated) == 1:
            return generated[0]
        if generated:
            return {"anyOf": generated}
        return {}


class SchemaBuilder:
    """Holds the ``$schema`` URI handling plus the root :class:`SchemaNode`.

    ``schema_uri`` semantics mirror genson_rs/builder.rs:13-41:
    ``"AUTO"`` → adopt the first merged schema's ``$schema`` (default URI if
    none seen); an explicit URI → always emit it; ``None`` → omit ``$schema``.
    """

    __slots__ = ("schema_uri", "root_node")

    def __init__(self, schema_uri: str | None = "AUTO"):
        self.root_node = SchemaNode()
        if schema_uri is None:
            self.schema_uri = _NULL_SCHEMA_URI
        elif schema_uri == "AUTO":
            self.schema_uri = None
        else:
            self.schema_uri = schema_uri

    def add_schema(self, schema: dict) -> None:
        # URI adoption only — no copy/pop: "$schema" is ignored as a
        # keyword at the strategy level (see add_extra_keywords), so the
        # key may flow through unchanged. This keeps per-doc schema dicts
        # identity-stable for the interning/identity-dedup fast paths.
        if not isinstance(schema, dict):
            raise ValueError("Invalid schema type - must be a valid JSON object")
        if self.schema_uri is None and "$schema" in schema:
            self.schema_uri = schema["$schema"]
        self.root_node.add_schema(schema)

    def add_schemas(self, schemas: list) -> None:
        """Batch variant of :func:`add_schema` (C4): same per-schema
        ``$schema`` handling in order, then one grouped root-node merge."""
        for schema in schemas:
            if not isinstance(schema, dict):
                raise ValueError("Invalid schema type - must be a valid JSON object")
            if self.schema_uri is None and "$schema" in schema:
                self.schema_uri = schema["$schema"]
        self.root_node.add_schemas(schemas)

    def add_object(self, obj) -> None:
        self.root_node.add_object(obj)

    def to_schema(self) -> dict:
        if self.schema_uri == _NULL_SCHEMA_URI:
            base = {}
        elif self.schema_uri is None:
            base = {"$schema": _DEFAULT_SCHEMA_URI}
        else:
            base = {"$schema": self.schema_uri}
        base.update(self.root_node.to_schema())
        return base
