package graft.intent

/** The reference UI's 27 sidebar example questions with their module group
  * (sap_sql_ui.html:1693-1734) — shared by the CLI's `examples` command and
  * the intent-classification spec. */
object ExampleQuestions {
  val all: Seq[(String, String)] = Seq(
    "FI_GL" -> "What is the trial balance for company code 1000?",
    "FI_GL" -> "Show journal entries posted in March 2026",
    "FI_AP" -> "Who are our top 10 vendors by total spend?",
    "FI_AP" -> "Show all open vendor items (unpaid invoices)",
    "FI_AR" -> "Show customer open items with aging buckets",
    "FI_AR" -> "Which customers have overdue invoices past 60 days?",
    "FI_AR" -> "What is the total outstanding receivables by customer?",
    "FI_AR" -> "Show open items for customer 1001 with document dates",
    "CO" -> "Show cost center actual vs plan variance",
    "CO" -> "What are the actual line items for cost center 1000?",
    "CO" -> "Show actual postings to cost center 4100 in 2026",
    "CO" -> "Show cost center spending by cost element",
    "MM" -> "Show purchase orders over $50,000 that are still open",
    "MM" -> "What materials are below reorder point?",
    "SD" -> "What sales orders were created in Q1 2026?",
    "SD" -> "Show the order-to-cash pipeline status",
    "SD" -> "Trace the O2C cycle for a sales order",
    "PM" -> "Show cancelled maintenance operations with work order details",
    "PM" -> "Which work orders have cancelled operations and why?",
    "PM" -> "List cancelled operations for plant 1000 with cancellation reasons",
    "PM" -> "Show equipment maintenance history",
    "HR" -> "Show headcount by organizational unit",
    "PAY" -> "What is the total payroll cost by cost center?",
    "BEN" -> "Show benefit enrollment counts by plan type",
    "MM" -> "Show the procure-to-pay pipeline",
    "SD" -> "What is our order-to-cash cycle time?",
    "FI_GL" -> "Show the month-end close status")
}
