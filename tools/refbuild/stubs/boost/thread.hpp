// std-backed stand-in for the subset of Boost.Thread the reference uses
// (boost::thread/mutex/unique_lock/condition_variable/bind/function,
//  this_thread::sleep_for, chrono::milliseconds).  Lets the reference
//  library build in an environment without Boost; semantics are identical
//  for the APIs exercised (see refbuild/README.md).
#pragma once
#include <iomanip>  // real Boost.Thread pulls this in transitively; FullSystem.cpp relies on it
#include <thread>
#include <mutex>
#include <condition_variable>
#include <functional>
#include <chrono>

namespace boost {

// boost::thread tolerates join() on a non-joinable thread (the reference
// double-joins via blockUntilMappingIsFinished + the destructor); std::thread
// throws, so wrap it.
class thread {
 public:
  thread() noexcept = default;
  template <class F, class... A,
            class = typename std::enable_if<
                !std::is_same<typename std::decay<F>::type, thread>::value>::type>
  explicit thread(F&& f, A&&... a)
      : t_(std::forward<F>(f), std::forward<A>(a)...) {}
  thread(thread&&) noexcept = default;
  thread& operator=(thread&& o) noexcept {
    if (t_.joinable()) t_.join();
    t_ = std::move(o.t_);
    return *this;
  }
  ~thread() {
    if (t_.joinable()) t_.join();
  }
  void join() {
    if (t_.joinable()) t_.join();
  }
  void detach() {
    if (t_.joinable()) t_.detach();
  }
  bool joinable() const { return t_.joinable(); }

 private:
  std::thread t_;
};
using mutex = std::mutex;
using recursive_mutex = std::recursive_mutex;
template <class M> using unique_lock = std::unique_lock<M>;
template <class M> using lock_guard = std::lock_guard<M>;
using condition_variable = std::condition_variable;
template <class T> using function = std::function<T>;
using std::bind;

namespace chrono {
using std::chrono::milliseconds;
using std::chrono::microseconds;
using std::chrono::seconds;
}  // namespace chrono

namespace this_thread {
template <class Rep, class Period>
inline void sleep_for(const std::chrono::duration<Rep, Period>& d) {
  std::this_thread::sleep_for(d);
}
inline void yield() { std::this_thread::yield(); }
}  // namespace this_thread

}  // namespace boost

// boost::bind exposes the placeholders at global scope.
using std::placeholders::_1;
using std::placeholders::_2;
using std::placeholders::_3;
using std::placeholders::_4;
