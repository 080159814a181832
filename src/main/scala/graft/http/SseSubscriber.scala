package graft.http

import java.nio.charset.StandardCharsets
import java.util.concurrent.{LinkedBlockingQueue, TimeUnit}

/**
 * Bounded per-client SSE event buffer with a periodic drain — the
 * reference's per-client `StreamActor` semantics
 * (`nsdb-http/.../actor/StreamActor.scala:54,69-79`): published records
 * accumulate in a bounded buffer that a scheduler drains every
 * `refresh_period`; a client that cannot keep up overflows the buffer and
 * is evicted instead of back-pressuring the publisher.
 *
 * `offer` never blocks — ingest latency is independent of subscriber
 * socket health. Each subscriber owns one daemon flusher thread (the
 * actor's message loop); a stalled socket blocks only its own thread
 * until overflow eviction closes it.
 */
final class SseSubscriber(
    write: Array[Byte] => Unit,
    onDead: () => Unit,
    capacity: Int,
    refreshMs: Long
) {

  private val queue               = new LinkedBlockingQueue[String](capacity)
  @volatile private var closedFlg = false

  def isClosed: Boolean = closedFlg

  /** Enqueue one JSON event. Non-blocking: a full buffer (stalled or
    * too-slow client) evicts the subscriber, reference behavior. */
  def offer(json: String): Unit =
    if (!closedFlg && !queue.offer(json)) close()

  def close(): Unit = {
    val wasOpen = !closedFlg
    closedFlg = true
    flusher.interrupt()
    if (wasOpen) onDead()
  }

  // one drain per refresh tick: every queued event goes out in a single
  // socket write (SSE framing per event), not one write per record
  private val flusher = new Thread(() => {
    try {
      while (!closedFlg) {
        val first = queue.poll(refreshMs, TimeUnit.MILLISECONDS)
        if (first != null) {
          val batch = new java.util.ArrayList[String]()
          batch.add(first)
          queue.drainTo(batch)
          val sb = new StringBuilder
          batch.forEach(j => sb.append("data: ").append(j).append("\n\n"))
          write(sb.toString.getBytes(StandardCharsets.UTF_8))
        }
      }
    } catch {
      case _: InterruptedException => () // close() requested
      case _: Throwable            => () // dead socket
    } finally {
      if (!closedFlg) { closedFlg = true; onDead() }
    }
  }, "graft-sse-flusher")
  flusher.setDaemon(true)
  flusher.start()
}
