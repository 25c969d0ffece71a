"""Probe available webcams (cv2 capture indices).

Parity reference: extra/list_cv2_webcams.py.
"""
import os

os.environ.setdefault("OPENCV_LOG_LEVEL", "SILENT")

import cv2  # noqa: E402

cv2.setLogLevel(0)


def main(max_index: int = 10):
    found = []
    for index in range(max_index):
        capture = cv2.VideoCapture(index)
        if capture.isOpened():
            width = int(capture.get(cv2.CAP_PROP_FRAME_WIDTH))
            height = int(capture.get(cv2.CAP_PROP_FRAME_HEIGHT))
            fps = capture.get(cv2.CAP_PROP_FPS)
            found.append((index, width, height, fps))
            print(f"webcam {index}: {width}x{height} @ {fps:.0f} fps")
        capture.release()
    if not found:
        print("no webcams found")
    return found


if __name__ == "__main__":
    main()
