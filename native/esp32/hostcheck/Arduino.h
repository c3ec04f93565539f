// Minimal Arduino API surface for host-side syntax checking of the firmware
// sources (tests/test_native.py::test_esp32_firmware_syntax).  NOT a
// simulator: just enough declarations for `g++ -fsyntax-only`.
#pragma once
#include <cstdint>
#include <string>

#define HIGH 1
#define LOW 0
#define INPUT 0
#define OUTPUT 1
#define SERIAL_8N1 0x800001c

using std::uint8_t;
using std::uint16_t;

inline void pinMode(int, int) {}
inline int digitalRead(int) { return LOW; }
inline void delay(unsigned long) {}
inline unsigned long millis() { return 0; }

class String {
 public:
  String() = default;
  String(const char*) {}
  String(const std::string&) {}
  String(int) {}
  void trim() {}
  bool operator==(const char*) const { return false; }
  String operator+(const String&) const { return {}; }
  friend String operator+(const char*, const String&) { return {}; }
};

class IPAddress {
 public:
  IPAddress() = default;
  IPAddress(uint8_t, uint8_t, uint8_t, uint8_t) {}
};

class HardwareSerial {
 public:
  void begin(long) {}
  void begin(long, int, int, int) {}
  int available() { return 0; }
  String readStringUntil(char) { return {}; }
  template <typename T>
  void print(const T&) {}
  template <typename T>
  void println(const T&) {}
  void println() {}
};

extern HardwareSerial Serial, Serial1, Serial2;

class EspClass {
 public:
  void restart() {}
};
extern EspClass ESP;
