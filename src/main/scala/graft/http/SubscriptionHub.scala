package graft.http

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper

import graft.plan.TimeContext

/** One live plain-query subscription: the registered predicate plus the
  * subscriber's bounded event buffer (any transport framing). */
final case class LiveSub(pred: Option[graft.sql.Ast.Predicate], sub: SseSubscriber)

/**
 * Transport-independent live-subscription registry (the reference's
 * `PublisherActor` role, `nsdb-cluster/.../PublisherActor.scala`): SSE and
 * WebSocket transports register bounded subscribers here, and every write
 * fans out once through [[publish]] with per-record predicate matching.
 * Registration and fan-out are lock-free (copy-on-write list): `publish`
 * never blocks on subscriber health — each subscriber's own buffer absorbs
 * or evicts.
 */
final class SubscriptionHub {

  private val mapper = new ObjectMapper()
  private val subs   = new java.util.concurrent.CopyOnWriteArrayList[LiveSub]()

  def add(l: LiveSub): Unit    = { subs.add(l); () }
  def remove(l: LiveSub): Unit = { subs.remove(l); () }

  /** registered subscriber count (post-eviction) — observability. */
  def size: Int = subs.size()

  /** Enqueue a freshly-written record for every matching subscription. */
  def publish(record: Map[String, Any]): Unit = {
    implicit val tc: TimeContext = TimeContext(System.currentTimeMillis())
    subs.forEach { s =>
      if (s.pred.forall(p => graft.exec.PredicateEval.matches(p, record, tc)))
        s.sub.offer(mapper.writeValueAsString(record.asJava))
    }
  }
}
