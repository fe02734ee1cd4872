"""ReID training: losses, trainer, ranking evaluation."""
