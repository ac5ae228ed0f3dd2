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
    """
    import importlib
    import importlib.util
    import inspect
    import os

    looks_like_path = (
        os.path.sep in location or location.endswith(".py") or os.path.isdir(location)
    )
    if looks_like_path:
        path = location.rstrip("/")
        if os.path.isdir(path):
            path = os.path.join(path, "__init__.py")
        elif not path.endswith(".py"):
            path = path + ".py"
        base = os.path.basename(os.path.dirname(path) if path.endswith("__init__.py") else path[:-3])
        mod_name = f"_radarpipeline_plugin_{base.replace('-', '_')}_{abs(hash(os.path.abspath(path))) & 0xFFFFFF:x}"
        spec = importlib.util.spec_from_file_location(mod_name, path)
        if spec is None or spec.loader is None:
            raise ValueError(f"cannot load plugin module from: {location}")
        module = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(module)
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
