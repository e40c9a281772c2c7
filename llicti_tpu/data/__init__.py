from .dataset import (EvalLoader, ImageDataset, TrainLoader, center_crop,
                      list_images, load_rgb, random_patch, synthetic_image)
