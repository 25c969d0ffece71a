// Standalone native flow-transfer demo (no Python, no TPU).
//
// Parity reference: extra/cpp/transflow.cpp (the reference's C++/OpenCV
// webcam-to-webcam version, 464 LoC). Independent design: instead of the
// reference's forward scatter of a remap table with random/linear reset
// (transflow.cpp:178-247), this uses the BACKWARD accumulate+remap
// formulation shared by this repo's TPU compositor and WebGL demo:
//
//   u'(p) = u(p + f(p)) + f(p)          (displacement accumulation)
//   u'   -= decay * u'                  (continuous soft reset)
//   out(p) = source(p + u'(p))          (gather)
//
// Build:   make standalone          (see Makefile)
// Run:     ./transflow_standalone INPUT [--output out.avi] [--frames N]
//              [--block N] [--gain G] [--decay D] [--headless]
// INPUT is a video path or a webcam index. With --output/--headless it
// runs without a display (testable in CI); otherwise it opens a window
// with hotkeys: r = re-grab source + clear accumulation, q/ESC = quit.
#include <opencv2/imgproc.hpp>
#include <opencv2/video/tracking.hpp>
#include <opencv2/videoio.hpp>
#include <opencv2/highgui.hpp>

#include <cstdio>
#include <cstring>
#include <string>

namespace {

struct Options {
  std::string input;
  std::string output;
  int frames = -1;       // -1 = until EOF / quit
  int block = 2;         // flow computed at 1/block resolution
  double gain = 1.0;
  double decay = 0.02;
  bool headless = false;
};

bool parse(int argc, char **argv, Options &opt) {
  if (argc < 2) return false;
  opt.input = argv[1];
  for (int i = 2; i < argc; ++i) {
    std::string arg = argv[i];
    auto next = [&]() -> const char * {
      return (i + 1 < argc) ? argv[++i] : nullptr;
    };
    if (arg == "--output") {
      const char *v = next(); if (!v) return false; opt.output = v;
    } else if (arg == "--frames") {
      const char *v = next(); if (!v) return false; opt.frames = atoi(v);
    } else if (arg == "--block") {
      const char *v = next(); if (!v) return false; opt.block = atoi(v);
    } else if (arg == "--gain") {
      const char *v = next(); if (!v) return false; opt.gain = atof(v);
    } else if (arg == "--decay") {
      const char *v = next(); if (!v) return false; opt.decay = atof(v);
    } else if (arg == "--headless") {
      opt.headless = true;
    } else {
      std::fprintf(stderr, "unknown flag %s\n", arg.c_str());
      return false;
    }
  }
  return true;
}

}  // namespace

int main(int argc, char **argv) {
  Options opt;
  if (!parse(argc, argv, opt)) {
    std::fprintf(stderr,
                 "usage: %s INPUT [--output out.avi] [--frames N] "
                 "[--block N] [--gain G] [--decay D] [--headless]\n",
                 argv[0]);
    return 2;
  }
  cv::VideoCapture capture;
  bool is_camera = !opt.input.empty() &&
      opt.input.find_first_not_of("0123456789") == std::string::npos;
  if (is_camera) capture.open(std::stoi(opt.input));
  else capture.open(opt.input);
  if (!capture.isOpened()) {
    std::fprintf(stderr, "cannot open input %s\n", opt.input.c_str());
    return 1;
  }
  cv::Mat frame_bgr;
  if (!capture.read(frame_bgr)) {
    std::fprintf(stderr, "no frames in input\n");
    return 1;
  }
  const int width = frame_bgr.cols, height = frame_bgr.rows;
  const int fw = width / opt.block, fh = height / opt.block;
  double fps = capture.get(cv::CAP_PROP_FPS);
  if (fps <= 0) fps = 30.0;

  cv::VideoWriter writer;
  if (!opt.output.empty()) {
    writer.open(opt.output, cv::VideoWriter::fourcc('M', 'J', 'P', 'G'),
                fps, {width, height});
    if (!writer.isOpened()) {
      std::fprintf(stderr, "cannot open output %s\n", opt.output.c_str());
      return 1;
    }
  }
  const bool show = !opt.headless && opt.output.empty();

  cv::Mat source = frame_bgr.clone();
  cv::Mat prev_gray, gray, small_prev, small_gray;
  cv::cvtColor(frame_bgr, prev_gray, cv::COLOR_BGR2GRAY);
  cv::resize(prev_gray, small_prev, {fw, fh});
  cv::Mat flow(fh, fw, CV_32FC2, cv::Scalar(0, 0));
  // accumulated displacement at full resolution, (dx, dy) float
  cv::Mat acc(height, width, CV_32FC2, cv::Scalar(0, 0));
  cv::Mat base_x(height, width, CV_32FC1), base_y(height, width, CV_32FC1);
  for (int i = 0; i < height; ++i)
    for (int j = 0; j < width; ++j) {
      base_x.at<float>(i, j) = static_cast<float>(j);
      base_y.at<float>(i, j) = static_cast<float>(i);
    }

  cv::Mat flow_full, map_x, map_y, acc_pulled, output;
  std::vector<cv::Mat> acc_ch(2), flow_ch(2);
  int produced = 0;
  while (opt.frames < 0 || produced < opt.frames) {
    if (!capture.read(frame_bgr)) break;
    cv::cvtColor(frame_bgr, gray, cv::COLOR_BGR2GRAY);
    cv::resize(gray, small_gray, {fw, fh});
    // backward flow (next -> prev), scaled up to full resolution
    cv::calcOpticalFlowFarneback(small_gray, small_prev, flow, 0.5, 3, 15,
                                 3, 5, 1.2, 0);
    cv::resize(flow, flow_full, {width, height});
    flow_full *= opt.block * opt.gain;
    // u'(p) = u(p + f(p)) + f(p): pull the accumulation through the flow
    cv::split(flow_full, flow_ch);
    cv::add(base_x, flow_ch[0], map_x);
    cv::add(base_y, flow_ch[1], map_y);
    cv::remap(acc, acc_pulled, map_x, map_y, cv::INTER_LINEAR,
              cv::BORDER_REPLICATE);
    cv::add(acc_pulled, flow_full, acc);
    acc *= (1.0 - opt.decay);  // u -= sign(u)*decay*|u|  ==  u *= 1-decay
    // out(p) = source(p + u(p))
    cv::split(acc, acc_ch);
    cv::add(base_x, acc_ch[0], map_x);
    cv::add(base_y, acc_ch[1], map_y);
    cv::remap(source, output, map_x, map_y, cv::INTER_NEAREST,
              cv::BORDER_REPLICATE);
    if (writer.isOpened()) writer.write(output);
    if (show) {
      cv::imshow("transflow-tpu standalone", output);
      int key = cv::waitKey(1) & 0xff;
      if (key == 'q' || key == 27) break;
      if (key == 'r') {
        source = frame_bgr.clone();
        acc.setTo(cv::Scalar(0, 0));
      }
    }
    std::swap(small_prev, small_gray);
    ++produced;
  }
  std::printf("%d frames\n", produced);
  return 0;
}
