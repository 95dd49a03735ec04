"""Training configuration (mirrors /root/reference/configs/train_config.py:8-47)."""

num_epochs = 12
batch_size = 16  # GLOBAL batch (the reference uses 2/GPU x N GPUs)
num_workers = 8
print_freq = 50
starting_epoch = 0
max_norm = 0.1  # gradient clip

output_dir = None  # default: checkpoints/{model_name}

# dataset
coco_path = "data/coco"
train_transform = "detr"  # preset name, see salience_detr_tpu/data/transforms.py
train_img_folder = f"{coco_path}/train2017"
train_ann_file = f"{coco_path}/annotations/instances_train2017.json"
test_img_folder = f"{coco_path}/val2017"
test_ann_file = f"{coco_path}/annotations/instances_val2017.json"

# model config file to train
model_path = "configs/salience_detr/salience_detr_resnet50_800_1333.py"

resume_from_checkpoint = None
# ImageNet backbone .pth converted into the model at startup (reference
# resnet.py:398-426 downloads these; no egress here, so point at a local file)
backbone_weights = None

# optimization (configs/train_config.py:43-47 + util/engine.py:30-35)
learning_rate = 1e-4
weight_decay = 1e-4
betas = (0.9, 0.999)
lr_milestones = [10]
lr_gamma = 0.1
warmup_factor = 1.0 / 1000
warmup_steps = 1000  # capped at steps_per_epoch
# param grouping (reference optimizer/param_dict.py): one of
#   finetune_backbone_and_linear_projection (default),
#   finetune_backbone_param, finetune_backbone_with_no_norm_weight_decay
param_dicts = "finetune_backbone_and_linear_projection"

# static-shape pipeline
train_canvas = (800, 1344)  # shortest side 800 / longest 1333, padded to /32
max_gt = 100  # static gt padding per image
