from gantron_tpu.eval.classifier import (ClassifierTrainer, MelCrops,
                                         load_files, prepare_npy_mels)
from gantron_tpu.eval.clustering import (check_clusterization, load_mels,
                                         run_clustering)
from gantron_tpu.eval.sampling import force_style_emotions, random_style
from gantron_tpu.eval.study import study_model, train_group_classifier

__all__ = [
    "ClassifierTrainer", "MelCrops", "load_files", "prepare_npy_mels",
    "check_clusterization", "load_mels", "run_clustering",
    "force_style_emotions", "random_style", "study_model",
    "train_group_classifier",
]
