from .transforms import denormalize, make_celeba_transform  # noqa: F401
from .datasets import (  # noqa: F401
    ArrayDataset,
    HFImageDataset,
    ImageFolderDataset,
    SubsetDataset,
    ensure_extracted,
)
from .loader import (  # noqa: F401
    DataLoader,
    DeviceCacheLoader,
    device_prefetch,
    materialize_corpus,
)
from .celeba import (  # noqa: F401
    build_hf_image_loader,
    create_subset_dataloader,
    get_celeba_loader_from_zip,
    get_celeba_loaders,
)
from .synthetic import BlobFacesDataset, blob_faces_array, render_blob_face  # noqa: F401
