from salience_detr_tpu.models.factory import build_salience_detr  # noqa: F401
