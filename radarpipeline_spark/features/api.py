"""Feature plugin API — the reference's extension surface, Spark-first.

The reference discovers ``FeatureGroup`` subclasses from git-cloned
plugin modules and runs their pandas ``preprocess``/``calculate`` on
the driver (reference: radarpipeline/features/feature.py:7-38,
feature_group.py:12-95, project/project.py:161-192).  Here the same
two-level API (group-level shared preprocess, per-feature calculate)
operates on **lazy Spark DataFrames**: a feature returns a plan, not a
materialized frame, so Catalyst fuses the whole group into as few
shuffles as the expressions allow.  No driver-side data movement.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Dict, List

from pyspark.sql import DataFrame


class Feature(ABC):
    """A named computation over preprocessed input tables."""

    name: str = ""
    description: str = ""
    required_input_data: List[str] = []

    def preprocess(self, data: Dict[str, DataFrame]) -> Dict[str, DataFrame]:
        return data

    @abstractmethod
    def calculate(self, data: Dict[str, DataFrame]) -> DataFrame: ...


class FeatureGroup(ABC):
    """Ordered collection of Features sharing a preprocess step
    (mirrors reference: features/feature_group.py:12-95; `features`
    holds classes, instantiated at run time)."""

    name: str = ""
    description: str = ""
    features: List[type] = []

    def preprocess(self, data: Dict[str, DataFrame]) -> Dict[str, DataFrame]:
        return data

    @property
    def required_input_data(self) -> List[str]:
        """Union of every member feature's requirements (reference:
        project/project.py:194-215)."""
        out: List[str] = []
        for cls in self.features:
            for v in cls.required_input_data:
                if v not in out:
                    out.append(v)
        return out

    def get_listed_features(self, names: List[str] | None = None) -> List[type]:
        """Filter by name, warning (not failing) on unknown names —
        reference: features/feature_group.py:74-95."""
        if names is None:
            return list(self.features)
        by_name = {cls.name: cls for cls in self.features}
        out = []
        for n in names:
            if n in by_name:
                out.append(by_name[n])
            else:
                import warnings

                warnings.warn(f"unknown feature name: {n}")
        return out

    def compute(
        self, data: Dict[str, DataFrame], feature_names: List[str] | None = None
    ) -> Dict[str, DataFrame]:
        """Run every (listed) feature over the shared preprocessed data;
        returns {feature_name: lazy DataFrame} — the fan-out of
        reference: features/feature_group.py:59-72, kept lazy."""
        shared = self.preprocess(data)
        out: Dict[str, DataFrame] = {}
        for cls in self.get_listed_features(feature_names):
            feat: Feature = cls()
            out[feat.name] = feat.calculate(feat.preprocess(shared))
        return out


def run_feature_groups(
    groups: List[FeatureGroup], data: Dict[str, DataFrame]
) -> Dict[str, DataFrame]:
    results: Dict[str, DataFrame] = {}
    for g in groups:
        results.update(g.compute(data))
    return results


def discover_feature_groups(location: str) -> List[FeatureGroup]:
    """Import a module and instantiate every concrete FeatureGroup
    subclass defined in it — the reference's plugin discovery
    (reference: project/project.py:161-192: sys.path insert +
    importlib + inspect.getmembers + isinstance filter), minus the
    implicit git clone (fetch plugin repos with deployment tooling;
    ``spark-submit --py-files`` ships them to executors).

    ``location`` is a dotted module name (``my_pkg.features``) or a
    filesystem path (``/plugins/my_features.py`` or a package dir).
    Paths load via ``importlib.util.spec_from_file_location`` under a
    private module name — NOT sys.path mutation + import-by-basename,
    which sys.modules short-circuits when the basename collides with an
    already-imported module (a plugin file named ``features.py`` would
    silently scan the wrong module).

    The private name is STABLE (md5 of the abspath, not the
    PYTHONHASHSEED-dependent ``hash()``) and the module is registered
    in ``sys.modules`` BEFORE exec: package-dir plugins whose
    ``__init__.py`` does relative/submodule imports need their parent
    package resolvable by name, and classes defined in the plugin can
    then pickle by reference.  Re-discovering the same path re-executes
    from disk (plugin files legitimately change between discoveries —
    the git fetch path re-resolves updated branches), purging the old
    module AND its submodules first so a package update can't load a
    stale submodule out of sys.modules; the stable name means pickle
    always resolves to the latest definition.
    """
    import hashlib
    import importlib
    import importlib.util
    import inspect
    import os
    import sys

    looks_like_path = (
        os.path.sep in location or location.endswith(".py") or os.path.isdir(location)
    )
    if looks_like_path:
        path = location.rstrip("/")
        is_pkg = False
        if os.path.isdir(path):
            path = os.path.join(path, "__init__.py")
            is_pkg = True
        elif os.path.basename(path) == "__init__.py":
            is_pkg = True
        elif not path.endswith(".py"):
            path = path + ".py"
        base = os.path.basename(os.path.dirname(path) if path.endswith("__init__.py") else path[:-3])
        abspath = os.path.abspath(path)
        suffix = hashlib.md5(abspath.encode()).hexdigest()[:8]
        mod_name = f"_radarpipeline_plugin_{base.replace('-', '_')}_{suffix}"
        for stale in [
            m for m in sys.modules
            if m == mod_name or m.startswith(mod_name + ".")
        ]:
            del sys.modules[stale]
        spec = importlib.util.spec_from_file_location(
            mod_name,
            path,
            submodule_search_locations=(
                [os.path.dirname(abspath)] if is_pkg else None
            ),
        )
        if spec is None or spec.loader is None:
            raise ValueError(f"cannot load plugin module from: {location}")
        module = importlib.util.module_from_spec(spec)
        sys.modules[mod_name] = module
        try:
            spec.loader.exec_module(module)
        except BaseException:
            sys.modules.pop(mod_name, None)
            raise
    else:
        module = importlib.import_module(location)

    groups: List[FeatureGroup] = []
    for _, obj in inspect.getmembers(module, inspect.isclass):
        if (
            obj is not FeatureGroup
            and obj is not Feature
            and issubclass(obj, FeatureGroup)
            and not inspect.isabstract(obj)
        ):
            groups.append(obj())
    if not groups:
        raise ValueError(f"no FeatureGroup subclasses found in: {location}")
    return groups
