// transflow_av — native libav (FFmpeg) shim for transflow-tpu.
//
// Two jobs the Python image cannot do by itself (no ffmpeg binary, no PyAV,
// cv2 built without an H.264 encoder):
//
//  1. Motion-vector export decode — the TPU-native counterpart of the
//     reference's PyAV path (transflow/flow/sources/av.py:29-77): open any
//     container or raw Annex-B stream, decode with flags2=+export_mvs, and
//     hand the raw AVMotionVector side-data records to Python (numpy parses
//     them with a structured dtype). This makes `--mv` work with NO PyAV.
//
//  2. H.264 encode via libx264 — the reference's default output codec
//     (transflow/output/ffmpeg.py:32-48 pipes rawvideo into `ffmpeg -vcodec
//     h264`); this shim gives the encoded-output chain a real H.264 writer
//     (rgb24 in, yuv420p x264 out, mp4/mkv/raw mux chosen from the path).
//     bf/refs knobs exist so tests can produce the bf=0 refs=1 streams the
//     motion-vector source requires (av.py:69 asserts source == -1).
//
// C ABI only (consumed via ctypes): tfav_dec_* / tfav_enc_*.
// Build: make -C native  (g++ -O3 -shared -fPIC + libavformat/-codec/-util/swscale)

#include <cstdint>
#include <cstring>
#include <string>

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libavutil/motion_vector.h>
#include <libavutil/opt.h>
#include <libswscale/swscale.h>
}

namespace {

struct Decoder {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* ctx = nullptr;
  AVPacket* pkt = nullptr;
  AVFrame* frame = nullptr;
  int stream = -1;
  bool draining = false;
  bool pending = false;  // pkt holds an unsent packet (send returned EAGAIN)
  std::string error;
};

struct Encoder {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* ctx = nullptr;
  AVStream* stream = nullptr;
  AVPacket* pkt = nullptr;
  AVFrame* frame = nullptr;
  SwsContext* sws = nullptr;
  int64_t pts = 0;
  std::string error;
};

int drain_packets(Encoder* e) {
  while (true) {
    int ret = avcodec_receive_packet(e->ctx, e->pkt);
    if (ret == AVERROR(EAGAIN) || ret == AVERROR_EOF) return 0;
    if (ret < 0) return ret;
    av_packet_rescale_ts(e->pkt, e->ctx->time_base, e->stream->time_base);
    e->pkt->stream_index = e->stream->index;
    ret = av_interleaved_write_frame(e->fmt, e->pkt);
    if (ret < 0) return ret;
  }
}

void set_error(std::string* slot, const char* what, int err) {
  char buf[AV_ERROR_MAX_STRING_SIZE] = {0};
  av_strerror(err, buf, sizeof buf);
  *slot = std::string(what) + ": " + buf;
}

}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// decode with motion-vector export
// ---------------------------------------------------------------------------

void* tfav_dec_open(const char* path, const char* format) {
  av_log_set_level(AV_LOG_WARNING);  // silence per-run x264 info banners
  auto* d = new Decoder();
  const AVInputFormat* ifmt =
      (format && *format) ? av_find_input_format(format) : nullptr;
  int ret = avformat_open_input(&d->fmt, path, ifmt, nullptr);
  if (ret < 0) { set_error(&d->error, "open_input", ret); return d; }
  ret = avformat_find_stream_info(d->fmt, nullptr);
  if (ret < 0) { set_error(&d->error, "stream_info", ret); return d; }
  const AVCodec* dec = nullptr;
  d->stream = av_find_best_stream(d->fmt, AVMEDIA_TYPE_VIDEO, -1, -1,
                                  &dec, 0);
  if (d->stream < 0 || !dec) { d->error = "no video stream"; return d; }
  d->ctx = avcodec_alloc_context3(dec);
  avcodec_parameters_to_context(d->ctx, d->fmt->streams[d->stream]->codecpar);
  AVDictionary* opts = nullptr;
  av_dict_set(&opts, "flags2", "+export_mvs", 0);
  ret = avcodec_open2(d->ctx, dec, &opts);
  av_dict_free(&opts);
  if (ret < 0) { set_error(&d->error, "avcodec_open2", ret); return d; }
  d->pkt = av_packet_alloc();
  d->frame = av_frame_alloc();
  return d;
}

const char* tfav_dec_error(void* handle) {
  auto* d = static_cast<Decoder*>(handle);
  return d->error.empty() ? nullptr : d->error.c_str();
}

int tfav_dec_info(void* handle, int* width, int* height, double* fps,
                  int64_t* nb_frames) {
  auto* d = static_cast<Decoder*>(handle);
  if (!d->ctx) return -1;
  *width = d->ctx->width;
  *height = d->ctx->height;
  AVStream* st = d->fmt->streams[d->stream];
  AVRational rate = st->avg_frame_rate.num ? st->avg_frame_rate
                                           : st->r_frame_rate;
  *fps = rate.den ? av_q2d(rate) : 0.0;
  *nb_frames = st->nb_frames;  // 0 when the container doesn't know
  return 0;
}

// Decode the next frame. Returns 1 with the frame's motion-vector records
// (raw AVMotionVector array — pointer valid until the next call), 0 at end
// of stream, <0 on error. Frames without side data report mv_count == 0.
int tfav_dec_next(void* handle, const uint8_t** mv_data, int* mv_count,
                  int* mv_record_size) {
  auto* d = static_cast<Decoder*>(handle);
  if (!d->ctx) return -1;
  *mv_data = nullptr;
  *mv_count = 0;
  *mv_record_size = (int)sizeof(AVMotionVector);
  while (true) {
    int ret = avcodec_receive_frame(d->ctx, d->frame);
    if (ret == 0) {
      AVFrameSideData* sd =
          av_frame_get_side_data(d->frame, AV_FRAME_DATA_MOTION_VECTORS);
      if (sd) {
        *mv_data = sd->data;
        *mv_count = (int)(sd->size / sizeof(AVMotionVector));
      }
      return 1;
    }
    if (ret == AVERROR_EOF) return 0;
    if (ret != AVERROR(EAGAIN)) {
      set_error(&d->error, "receive_frame", ret);
      return ret;
    }
    if (d->draining) return 0;
    while (true) {
      if (!d->pending) {
        ret = av_read_frame(d->fmt, d->pkt);
        if (ret == AVERROR_EOF) {
          d->draining = true;
          avcodec_send_packet(d->ctx, nullptr);
          break;
        }
        if (ret < 0) { set_error(&d->error, "read_frame", ret); return ret; }
        if (d->pkt->stream_index != d->stream) {
          av_packet_unref(d->pkt);
          continue;
        }
      }
      ret = avcodec_send_packet(d->ctx, d->pkt);
      if (ret == AVERROR(EAGAIN)) {
        // decoder input full while output pending: keep the packet and go
        // drain receive_frame first (dropping it here loses a frame)
        d->pending = true;
        break;
      }
      d->pending = false;
      av_packet_unref(d->pkt);
      if (ret < 0) {
        set_error(&d->error, "send_packet", ret);
        return ret;
      }
      break;
    }
  }
}

// Rewind to the start of the stream (reference rewind semantics:
// flow/sources/av.py re-opens; a backward seek + flush is equivalent).
int tfav_dec_rewind(void* handle) {
  auto* d = static_cast<Decoder*>(handle);
  if (!d->ctx) return -1;
  int ret = av_seek_frame(d->fmt, d->stream, 0,
                          AVSEEK_FLAG_BACKWARD | AVSEEK_FLAG_BYTE);
  if (ret < 0) ret = av_seek_frame(d->fmt, d->stream, 0, AVSEEK_FLAG_BACKWARD);
  if (ret < 0) { set_error(&d->error, "seek", ret); return ret; }
  avcodec_flush_buffers(d->ctx);
  if (d->pending) av_packet_unref(d->pkt);
  d->pending = false;
  d->draining = false;
  return 0;
}

void tfav_dec_close(void* handle) {
  auto* d = static_cast<Decoder*>(handle);
  if (d->frame) av_frame_free(&d->frame);
  if (d->pkt) av_packet_free(&d->pkt);
  if (d->ctx) avcodec_free_context(&d->ctx);
  if (d->fmt) avformat_close_input(&d->fmt);
  delete d;
}

// ---------------------------------------------------------------------------
// encode (libx264, rgb24 in, container guessed from the path)
// ---------------------------------------------------------------------------

void* tfav_enc_open(const char* path, const char* codec_name, int width,
                    int height, double fps, int gop, int max_b_frames,
                    int refs, int crf, const char* preset) {
  av_log_set_level(AV_LOG_WARNING);  // silence per-run x264 info banners
  auto* e = new Encoder();
  int ret = avformat_alloc_output_context2(&e->fmt, nullptr, nullptr, path);
  if (ret < 0 || !e->fmt) {
    // raw Annex-B fallback for extensions the muxer table doesn't know
    ret = avformat_alloc_output_context2(&e->fmt, nullptr, "h264", path);
    if (ret < 0) { set_error(&e->error, "alloc_output", ret); return e; }
  }
  if (!codec_name || !*codec_name) codec_name = "libx264";
  const AVCodec* codec = avcodec_find_encoder_by_name(codec_name);
  if (!codec) {
    e->error = std::string(codec_name) + " encoder not available";
    return e;
  }
  e->ctx = avcodec_alloc_context3(codec);
  e->ctx->width = width;
  e->ctx->height = height;
  AVRational rate = av_d2q(fps, 1 << 16);
  e->ctx->time_base = av_inv_q(rate);
  e->ctx->framerate = rate;
  e->ctx->pix_fmt = AV_PIX_FMT_YUV420P;
  e->ctx->gop_size = gop > 0 ? gop : 250;
  e->ctx->max_b_frames = max_b_frames;  // 0 => the MV source's bf=0 contract
  if (refs > 0) e->ctx->refs = refs;
  if (e->fmt->oformat->flags & AVFMT_GLOBALHEADER)
    e->ctx->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
  av_opt_set(e->ctx->priv_data, "preset", preset && *preset ? preset : "fast",
             0);
  av_opt_set_int(e->ctx->priv_data, "crf", crf >= 0 ? crf : 18, 0);
  int err = avcodec_open2(e->ctx, codec, nullptr);
  if (err < 0) { set_error(&e->error, "avcodec_open2", err); return e; }
  e->stream = avformat_new_stream(e->fmt, nullptr);
  e->stream->time_base = e->ctx->time_base;
  e->stream->avg_frame_rate = rate;
  avcodec_parameters_from_context(e->stream->codecpar, e->ctx);
  if (!(e->fmt->oformat->flags & AVFMT_NOFILE)) {
    err = avio_open(&e->fmt->pb, path, AVIO_FLAG_WRITE);
    if (err < 0) { set_error(&e->error, "avio_open", err); return e; }
  }
  err = avformat_write_header(e->fmt, nullptr);
  if (err < 0) { set_error(&e->error, "write_header", err); return e; }
  e->pkt = av_packet_alloc();
  e->frame = av_frame_alloc();
  e->frame->format = AV_PIX_FMT_YUV420P;
  e->frame->width = width;
  e->frame->height = height;
  av_frame_get_buffer(e->frame, 0);
  e->sws = sws_getContext(width, height, AV_PIX_FMT_RGB24, width, height,
                          AV_PIX_FMT_YUV420P, SWS_BILINEAR, nullptr, nullptr,
                          nullptr);
  return e;
}

const char* tfav_enc_error(void* handle) {
  auto* e = static_cast<Encoder*>(handle);
  return e->error.empty() ? nullptr : e->error.c_str();
}

int tfav_enc_write(void* handle, const uint8_t* rgb) {
  auto* e = static_cast<Encoder*>(handle);
  if (!e->sws) return -1;
  av_frame_make_writable(e->frame);
  const uint8_t* src[1] = {rgb};
  const int src_stride[1] = {3 * e->ctx->width};
  sws_scale(e->sws, src, src_stride, 0, e->ctx->height, e->frame->data,
            e->frame->linesize);
  e->frame->pts = e->pts++;
  int ret = avcodec_send_frame(e->ctx, e->frame);
  if (ret < 0) { set_error(&e->error, "send_frame", ret); return ret; }
  ret = drain_packets(e);
  if (ret < 0) set_error(&e->error, "write_frame", ret);
  return ret;
}

int tfav_enc_close(void* handle) {
  auto* e = static_cast<Encoder*>(handle);
  int ret = 0;
  if (e->ctx && e->sws) {
    avcodec_send_frame(e->ctx, nullptr);  // flush
    ret = drain_packets(e);
    if (ret == 0 && e->fmt) ret = av_write_trailer(e->fmt);
  }
  if (e->sws) sws_freeContext(e->sws);
  if (e->frame) av_frame_free(&e->frame);
  if (e->pkt) av_packet_free(&e->pkt);
  if (e->ctx) avcodec_free_context(&e->ctx);
  if (e->fmt) {
    if (!(e->fmt->oformat->flags & AVFMT_NOFILE) && e->fmt->pb)
      avio_closep(&e->fmt->pb);
    avformat_free_context(e->fmt);
  }
  delete e;
  return ret;
}

}  // extern "C"
