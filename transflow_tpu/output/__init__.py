from .video_output import VideoOutput
from .archive import NumpyArchiveOutput, ZipOutput

__all__ = ["VideoOutput", "NumpyArchiveOutput", "ZipOutput"]
