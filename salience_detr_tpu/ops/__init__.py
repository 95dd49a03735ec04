from salience_detr_tpu.ops import boxes, deform_attn, hungarian, losses, misc, nms, pos_encoding  # noqa: F401
