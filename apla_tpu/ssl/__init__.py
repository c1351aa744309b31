"""Self-supervised objectives (BYOL/SimSiam, DINO, DINOv2) — reference
`src/self_supervised/`."""


def get_ssl_wrapper_and_trainer(args):
    if args.dinov2:
        from .dinov2 import DINOv2Wrapper, Dinov2Trainer
        return DINOv2Wrapper, Dinov2Trainer
    if args.dino:
        from .dino import DINOWrapper, DINOTrainer
        return DINOWrapper, DINOTrainer
    from .byol import BYOLWrapper, BYOLTrainer
    if args.byol:
        BYOLWrapper.use_momentum = True
    else:  # simsiam
        BYOLWrapper.use_momentum = False
    return BYOLWrapper, BYOLTrainer
