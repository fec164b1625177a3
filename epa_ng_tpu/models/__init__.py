from epa_ng_tpu.models.model import Model, DataType, ParamValue, ModelError  # noqa: F401
