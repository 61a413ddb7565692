"""Test fixture: a module whose INTERNAL import is broken (see
test_registry_reraises_nested_import_error)."""
import service_level_reporting_spark.operators.nonexistent_submodule  # noqa: F401
