// Real-time control-loop executor.
//
// C++ replacement for the reference's Cython extension
// (/root/reference/src/dart_planner/control/rt_control_extension.pyx):
// a dedicated high-priority thread runs a fixed-rate loop (<= 1 kHz) with
// deadline enforcement (50 us margin, pyx:31), a 1000-entry circular
// execution-time buffer with jitter RMS (pyx:285-338), and a C fast-path
// PID iteration (pyx:432-466) so no Python/GIL work happens per tick.
// State/setpoint/command exchange is double-buffered under a light mutex;
// Python talks to it through the C ABI below (ctypes).
//
// Improvements over the reference extension: the PID keeps real integral
// state with clamping (the reference zeroes its integrals every tick,
// pyx:445), the position-loop output feeds thrust instead of being
// overwritten by the attitude loop (pyx:452-466 discards it), and jitter
// is additionally measured on loop intervals, which is what actually
// bounds control regularity.

#include <atomic>
#include <chrono>
#include <cmath>
#include <cstring>
#include <mutex>
#include <thread>

#if defined(__linux__)
#include <pthread.h>
#include <sched.h>
#endif

namespace {

constexpr int kBufLen = 1000;
constexpr double kMaxFrequencyHz = 1000.0;  // pyx:28
constexpr double kDeadlineMargin = 50e-6;   // pyx:31

struct ControlState {  // pyx:45-52
  double position[3];
  double velocity[3];
  double attitude[3];
  double angular_velocity[3];
  double timestamp;
  bool valid;
};

struct Setpoint {  // pyx ControlCommand:54-60
  double position[3];
  double velocity[3];
  double attitude[3];
  double angular_velocity[3];
  double thrust_ff;  // feedforward thrust (hover)
  bool valid;
};

struct Gains {  // pyx ControlGains:62-69
  double kp_pos[3];
  double ki_pos[3];
  double kd_pos[3];
  double kp_att[3];
  double ki_att[3];
  double kd_att[3];
};

struct Output {  // thrust + body rates (pyx control_output)
  double thrust;
  double rates[3];
  unsigned long long iteration;
  bool valid;
};

class RtLoop {
 public:
  explicit RtLoop(double frequency_hz)
      : freq_(frequency_hz > kMaxFrequencyHz ? kMaxFrequencyHz : frequency_hz),
        period_(1.0 / freq_) {
    std::memset(&state_, 0, sizeof(state_));
    std::memset(&setpoint_, 0, sizeof(setpoint_));
    std::memset(&gains_, 0, sizeof(gains_));
    std::memset(&output_, 0, sizeof(output_));
    std::memset(exec_times_, 0, sizeof(exec_times_));
    std::memset(intervals_, 0, sizeof(intervals_));
  }

  ~RtLoop() { stop(); }

  void start() {
    if (running_.exchange(true)) return;
    thread_ = std::thread(&RtLoop::run, this);
  }

  void stop() {
    if (!running_.exchange(false)) return;
    if (thread_.joinable()) thread_.join();
  }

  void set_state(const double* s) {
    std::lock_guard<std::mutex> g(mu_);
    std::memcpy(state_.position, s + 0, 3 * sizeof(double));
    std::memcpy(state_.velocity, s + 3, 3 * sizeof(double));
    std::memcpy(state_.attitude, s + 6, 3 * sizeof(double));
    std::memcpy(state_.angular_velocity, s + 9, 3 * sizeof(double));
    state_.timestamp = s[12];
    state_.valid = true;
  }

  void set_setpoint(const double* s) {
    std::lock_guard<std::mutex> g(mu_);
    std::memcpy(setpoint_.position, s + 0, 3 * sizeof(double));
    std::memcpy(setpoint_.velocity, s + 3, 3 * sizeof(double));
    std::memcpy(setpoint_.attitude, s + 6, 3 * sizeof(double));
    std::memcpy(setpoint_.angular_velocity, s + 9, 3 * sizeof(double));
    setpoint_.thrust_ff = s[12];
    setpoint_.valid = true;
  }

  void set_gains(const double* g18) {
    std::lock_guard<std::mutex> g(mu_);
    std::memcpy(gains_.kp_pos, g18 + 0, 3 * sizeof(double));
    std::memcpy(gains_.ki_pos, g18 + 3, 3 * sizeof(double));
    std::memcpy(gains_.kd_pos, g18 + 6, 3 * sizeof(double));
    std::memcpy(gains_.kp_att, g18 + 9, 3 * sizeof(double));
    std::memcpy(gains_.ki_att, g18 + 12, 3 * sizeof(double));
    std::memcpy(gains_.kd_att, g18 + 15, 3 * sizeof(double));
  }

  // out5 = thrust, p, q, r, iteration
  bool get_command(double* out5) {
    std::lock_guard<std::mutex> g(mu_);
    if (!output_.valid) return false;
    out5[0] = output_.thrust;
    out5[1] = output_.rates[0];
    out5[2] = output_.rates[1];
    out5[3] = output_.rates[2];
    out5[4] = static_cast<double>(output_.iteration);
    return true;
  }

  // out10: iterations, missed, mean_exec, max_exec, min_exec, jitter_rms,
  //        freq_actual, freq_target, interval_jitter_rms, running
  void get_stats(double* out10) {
    std::lock_guard<std::mutex> g(mu_);
    const unsigned long long n = iterations_;
    double sum = 0, mx = 0, mn = 1e30;
    int count = 0;
    for (int i = 0; i < kBufLen; ++i) {
      if (exec_times_[i] > 0) {
        sum += exec_times_[i];
        if (exec_times_[i] > mx) mx = exec_times_[i];
        if (exec_times_[i] < mn) mn = exec_times_[i];
        ++count;
      }
    }
    const double mean = count ? sum / count : 0.0;
    double jsum = 0;
    for (int i = 0; i < kBufLen; ++i)
      if (exec_times_[i] > 0) jsum += (exec_times_[i] - mean) * (exec_times_[i] - mean);
    double ijsum = 0;
    int icount = 0;
    for (int i = 0; i < kBufLen; ++i) {
      if (intervals_[i] > 0) {
        const double d = intervals_[i] - period_;
        ijsum += d * d;
        ++icount;
      }
    }
    out10[0] = static_cast<double>(n);
    out10[1] = static_cast<double>(missed_);
    out10[2] = mean;
    out10[3] = mx;
    out10[4] = (mn > 1e29) ? 0.0 : mn;
    out10[5] = count ? std::sqrt(jsum / count) : 0.0;
    out10[6] = elapsed_ > 0 ? n / elapsed_ : 0.0;
    out10[7] = freq_;
    out10[8] = icount ? std::sqrt(ijsum / icount) : 0.0;
    out10[9] = running_.load() ? 1.0 : 0.0;
  }

  // Copy the valid execution-time samples (seconds) out of the circular
  // buffer; returns the number copied. Lets the host compute order
  // statistics (p95/p99) the 10-double stats ABI cannot carry — the
  // reference CI gate is a p95 (tests/test_real_time_latency.py:109-120).
  int get_exec_times(double* out, int max_n) {
    std::lock_guard<std::mutex> g(mu_);
    int c = 0;
    for (int i = 0; i < kBufLen && c < max_n; ++i)
      if (exec_times_[i] > 0) out[c++] = exec_times_[i];
    return c;
  }

 private:
  using clock = std::chrono::steady_clock;

  static double now_s() {
    return std::chrono::duration<double>(clock::now().time_since_epoch()).count();
  }

  void set_thread_priority() {
#if defined(__linux__)
    // SCHED_FIFO needs privileges; fall back silently (reference
    // real_time_core.py:32-166 does the same dance)
    sched_param sp{};
    sp.sched_priority = 80;
    pthread_setschedparam(pthread_self(), SCHED_FIFO, &sp);
#endif
  }

  void run() {
    set_thread_priority();
    const double start = now_s();
    double next_deadline = start + period_;
    double last_start = 0.0;
    int idx = 0;

    while (running_.load(std::memory_order_relaxed)) {
      const double t0 = now_s();
      if (t0 > next_deadline + kDeadlineMargin) {
        std::lock_guard<std::mutex> g(mu_);
        ++missed_;
      }
      iterate(t0);
      const double t1 = now_s();
      {
        std::lock_guard<std::mutex> g(mu_);
        exec_times_[idx] = t1 - t0;
        if (last_start > 0) intervals_[idx] = t0 - last_start;
        idx = (idx + 1) % kBufLen;
        ++iterations_;
        elapsed_ = t1 - start;
      }
      last_start = t0;

      // sleep to the deadline, spinning the last ~50 us for precision
      double remaining = next_deadline - now_s();
      if (remaining > 100e-6) {
        std::this_thread::sleep_for(
            std::chrono::duration<double>(remaining - 50e-6));
      }
      while (now_s() < next_deadline && running_.load(std::memory_order_relaxed)) {
      }
      next_deadline += period_;
      // skip missed slots instead of bursting
      const double now = now_s();
      if (next_deadline < now)
        next_deadline = now + period_;
    }
  }

  void iterate(double /*t*/) {
    std::lock_guard<std::mutex> g(mu_);
    if (!state_.valid || !setpoint_.valid) return;
    const double dt = period_;
    // position/velocity PID -> vertical thrust correction (fast path;
    // the full geometric controller runs on-device, this loop only holds
    // the high-rate inner tracking like the reference's simplified PID)
    double acc_z = 0.0;
    for (int i = 0; i < 3; ++i) {
      const double pe = setpoint_.position[i] - state_.position[i];
      const double ve = setpoint_.velocity[i] - state_.velocity[i];
      pos_integral_[i] += pe * dt;
      if (pos_integral_[i] > 2.0) pos_integral_[i] = 2.0;
      if (pos_integral_[i] < -2.0) pos_integral_[i] = -2.0;
      const double u = gains_.kp_pos[i] * pe + gains_.ki_pos[i] * pos_integral_[i] +
                       gains_.kd_pos[i] * ve;
      if (i == 2) acc_z = u;
    }
    output_.thrust = setpoint_.thrust_ff + acc_z;
    if (output_.thrust < 0.0) output_.thrust = 0.0;
    // attitude PID -> body rates
    for (int i = 0; i < 3; ++i) {
      const double ae = setpoint_.attitude[i] - state_.attitude[i];
      const double we = setpoint_.angular_velocity[i] - state_.angular_velocity[i];
      att_integral_[i] += ae * dt;
      if (att_integral_[i] > 1.0) att_integral_[i] = 1.0;
      if (att_integral_[i] < -1.0) att_integral_[i] = -1.0;
      output_.rates[i] = gains_.kp_att[i] * ae + gains_.ki_att[i] * att_integral_[i] +
                         gains_.kd_att[i] * we;
    }
    output_.iteration = iterations_;
    output_.valid = true;
  }

  const double freq_;
  const double period_;
  std::atomic<bool> running_{false};
  std::thread thread_;
  std::mutex mu_;

  ControlState state_;
  Setpoint setpoint_;
  Gains gains_;
  Output output_;
  double pos_integral_[3] = {0, 0, 0};
  double att_integral_[3] = {0, 0, 0};

  double exec_times_[kBufLen];
  double intervals_[kBufLen];
  unsigned long long iterations_ = 0;
  unsigned long long missed_ = 0;
  double elapsed_ = 0.0;
};

}  // namespace

extern "C" {

void* rt_create(double frequency_hz) { return new RtLoop(frequency_hz); }
void rt_destroy(void* h) { delete static_cast<RtLoop*>(h); }
void rt_start(void* h) { static_cast<RtLoop*>(h)->start(); }
void rt_stop(void* h) { static_cast<RtLoop*>(h)->stop(); }
void rt_set_state(void* h, const double* s13) {
  static_cast<RtLoop*>(h)->set_state(s13);
}
void rt_set_setpoint(void* h, const double* s13) {
  static_cast<RtLoop*>(h)->set_setpoint(s13);
}
void rt_set_gains(void* h, const double* g18) {
  static_cast<RtLoop*>(h)->set_gains(g18);
}
int rt_get_command(void* h, double* out5) {
  return static_cast<RtLoop*>(h)->get_command(out5) ? 1 : 0;
}
void rt_get_stats(void* h, double* out10) {
  static_cast<RtLoop*>(h)->get_stats(out10);
}
int rt_get_exec_times(void* h, double* out, int max_n) {
  return static_cast<RtLoop*>(h)->get_exec_times(out, max_n);
}

}  // extern "C"
