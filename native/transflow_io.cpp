// transflow_io — native host IO runtime for transflow-tpu.
//
// TPU-native counterpart of the reference's process-based IO
// (transflow/pipeline.py:56-136 SourceProcess/OutputProcess) and of the
// realtime C++ shell (extra/cpp/transflow.cpp:138-270): decode, resize and
// color-convert run on dedicated native threads (no GIL), handing frames to
// the Python/JAX loop through a bounded ring buffer with condition-variable
// backpressure — the same producer/consumer discipline as the reference's
// maxsize-1 queues, minus the pickling and process boundaries.
//
// C ABI only (consumed via ctypes): tfio_reader_* / tfio_writer_* / tfio_display_*.
//
// Build: make -C native  (g++ -O3 -march=native -shared -fPIC + opencv4)

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include <opencv2/opencv.hpp>

namespace {

struct Frame {
  std::vector<uint8_t> data;
  bool end_of_stream = false;
};

// Bounded MPMC-safe frame ring with condvar backpressure.
class FrameRing {
 public:
  explicit FrameRing(size_t capacity) : capacity_(capacity) {}

  bool push(Frame&& frame, std::atomic<bool>& stop) {
    std::unique_lock<std::mutex> lock(mutex_);
    not_full_.wait(lock, [&] { return queue_.size() < capacity_ || stop; });
    if (stop) return false;
    queue_.push_back(std::move(frame));
    not_empty_.notify_one();
    return true;
  }

  bool pop(Frame& out, int timeout_ms) {
    std::unique_lock<std::mutex> lock(mutex_);
    if (!not_empty_.wait_for(lock, std::chrono::milliseconds(timeout_ms),
                             [&] { return !queue_.empty(); }))
      return false;
    out = std::move(queue_.front());
    queue_.pop_front();
    not_full_.notify_one();
    return true;
  }

  void wake_all() {
    std::lock_guard<std::mutex> lock(mutex_);
    not_full_.notify_all();
    not_empty_.notify_all();
  }

 private:
  size_t capacity_;
  std::deque<Frame> queue_;
  std::mutex mutex_;
  std::condition_variable not_full_, not_empty_;
};

struct Reader {
  cv::VideoCapture capture;
  FrameRing ring{4};
  std::thread worker;
  std::atomic<bool> stop{false};
  int width = 0, height = 0;
  double fps = 0.0;
  int64_t frame_count = 0;
  int out_width = 0, out_height = 0;
  bool gray = false;
  int skip = 0;

  void run() {
    cv::Mat bgr, resized, converted;
    for (int i = 0; i < skip && !stop; ++i) capture.grab();
    while (!stop) {
      if (!capture.read(bgr) || bgr.empty()) break;
      cv::Mat* src = &bgr;
      if (bgr.cols != out_width || bgr.rows != out_height) {
        cv::resize(bgr, resized, cv::Size(out_width, out_height), 0, 0,
                   cv::INTER_NEAREST);
        src = &resized;
      }
      if (gray)
        cv::cvtColor(*src, converted, cv::COLOR_BGR2GRAY);
      else
        cv::cvtColor(*src, converted, cv::COLOR_BGR2RGB);
      Frame frame;
      frame.data.assign(converted.data,
                        converted.data + converted.total() *
                                             converted.elemSize());
      if (!ring.push(std::move(frame), stop)) return;
    }
    Frame eos;
    eos.end_of_stream = true;
    ring.push(std::move(eos), stop);
  }
};

struct Writer {
  cv::VideoWriter writer;
  FrameRing ring{4};
  std::thread worker;
  std::atomic<bool> stop{false};
  int width = 0, height = 0;

  void run() {
    Frame frame;
    cv::Mat bgr;
    while (!stop) {
      if (!ring.pop(frame, 200)) continue;
      if (frame.end_of_stream) break;
      cv::Mat rgb(height, width, CV_8UC3, frame.data.data());
      cv::cvtColor(rgb, bgr, cv::COLOR_RGB2BGR);
      writer.write(bgr);
    }
    writer.release();
  }
};

}  // namespace

extern "C" {

// ---------------------------------------------------------------- reader --

void* tfio_reader_open(const char* path, int camera_index, int req_width,
                       int req_height, int gray, int skip_frames) {
  auto* reader = new Reader();
  if (camera_index >= 0) {
    reader->capture.open(camera_index);
    if (req_width > 0) reader->capture.set(cv::CAP_PROP_FRAME_WIDTH, req_width);
    if (req_height > 0)
      reader->capture.set(cv::CAP_PROP_FRAME_HEIGHT, req_height);
  } else {
    reader->capture.open(path);
  }
  if (!reader->capture.isOpened()) {
    delete reader;
    return nullptr;
  }
  reader->width = (int)reader->capture.get(cv::CAP_PROP_FRAME_WIDTH);
  reader->height = (int)reader->capture.get(cv::CAP_PROP_FRAME_HEIGHT);
  reader->fps = reader->capture.get(cv::CAP_PROP_FPS);
  reader->frame_count = (int64_t)reader->capture.get(cv::CAP_PROP_FRAME_COUNT);
  reader->out_width = req_width > 0 ? req_width : reader->width;
  reader->out_height = req_height > 0 ? req_height : reader->height;
  reader->gray = gray != 0;
  reader->skip = skip_frames;
  reader->worker = std::thread([reader] { reader->run(); });
  return reader;
}

void tfio_reader_meta(void* handle, int* width, int* height, double* fps,
                      int64_t* frame_count) {
  auto* reader = static_cast<Reader*>(handle);
  *width = reader->out_width;
  *height = reader->out_height;
  *fps = reader->fps;
  *frame_count = reader->frame_count;
}

// Returns 1 on frame, 0 on timeout, -1 on end of stream.
int tfio_reader_next(void* handle, uint8_t* out, int64_t capacity,
                     int timeout_ms) {
  auto* reader = static_cast<Reader*>(handle);
  Frame frame;
  if (!reader->ring.pop(frame, timeout_ms)) return 0;
  if (frame.end_of_stream) return -1;
  if ((int64_t)frame.data.size() > capacity) return -2;
  std::memcpy(out, frame.data.data(), frame.data.size());
  return 1;
}

void tfio_reader_close(void* handle) {
  auto* reader = static_cast<Reader*>(handle);
  reader->stop = true;
  reader->ring.wake_all();
  if (reader->worker.joinable()) reader->worker.join();
  reader->capture.release();
  delete reader;
}

// ---------------------------------------------------------------- writer --

void* tfio_writer_open(const char* path, int width, int height, double fps,
                       const char* fourcc) {
  auto* writer = new Writer();
  int code = cv::VideoWriter::fourcc(fourcc[0], fourcc[1], fourcc[2],
                                     fourcc[3]);
  writer->writer.open(path, code, fps, cv::Size(width, height));
  if (!writer->writer.isOpened()) {
    delete writer;
    return nullptr;
  }
  writer->width = width;
  writer->height = height;
  writer->worker = std::thread([writer] { writer->run(); });
  return writer;
}

int tfio_writer_feed(void* handle, const uint8_t* rgb, int64_t size) {
  auto* writer = static_cast<Writer*>(handle);
  Frame frame;
  frame.data.assign(rgb, rgb + size);
  return writer->ring.push(std::move(frame), writer->stop) ? 1 : 0;
}

void tfio_writer_close(void* handle) {
  auto* writer = static_cast<Writer*>(handle);
  Frame eos;
  eos.end_of_stream = true;
  writer->ring.push(eos.end_of_stream ? std::move(eos) : Frame{},
                    writer->stop);
  if (writer->worker.joinable()) writer->worker.join();
  delete writer;
}

// --------------------------------------------------------------- display --

// Live preview window (realtime shell parity: extra/cpp/transflow.cpp
// display loop + hotkeys). Returns the pressed key (or -1).
int tfio_display(const char* window_name, const uint8_t* rgb, int width,
                 int height, int wait_ms) {
  cv::Mat mat(height, width, CV_8UC3, const_cast<uint8_t*>(rgb));
  cv::Mat bgr;
  cv::cvtColor(mat, bgr, cv::COLOR_RGB2BGR);
  cv::imshow(window_name, bgr);
  return cv::waitKey(wait_ms);
}

}  // extern "C"
